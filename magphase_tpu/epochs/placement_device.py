"""On-device epoch placement: the period-integrating mark walk as a
batched early-exit lax.while_loop.

The walk is inherently sequential over marks (each mark's position feeds
the next), but it is trivially vmappable over utterances: one loop
advances every utterance's walker in lockstep until all are done.  This
keeps the fused pipelines device-resident (no signal download for the
host walk in epochs/tracker.py:place_epochs — the two implementations
are sample-exact equals; see tests/test_copy_synthesis_batch.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.padding import bucket
from .tracker import (FRAME_STEP_S, FS_ANALYSIS, SNAP_HALF_ONSET,
                      SNAP_HALF_RUN, SNAP_ONSET_MARKS)

_WALK_UNROLL = 8          # walk-body copies per while_loop iteration
                          # (tools/walk_bench.py sweep on v5e: 2:13.0ms
                          # 4:12.7 8:9.3 16:11.9 32:13.0 per 24-utt group)


def _snap_win(fs: int) -> int:
    """Trough-search slice width for the voiced snap.

    The widest searched span is the onset window [t+(1-h)p, t+(1+h)p)
    with h = SNAP_HALF_ONSET: at most 2h*p_max + 2 samples with
    p_max = fs/F0_MIN (the kernel clips the period there) — 674 at
    48 kHz, 226 at 16 kHz.  Sizing by fs instead of a fixed maximum
    halves the per-mark argmin work at 48 kHz."""
    return bucket(int(np.ceil(2 * SNAP_HALF_ONSET * fs / 50.0)) + 2, 128)


def placement_m_max(n_pad_sig: int, fs: int, frm_step: int = 128) -> int:
    """Worst-case mark-array capacity for the device epoch walk.

    The densest legitimate mark train is sustained voicing at the
    tracker's F0 ceiling (400 Hz, tracker.py F0_MAX): 400 marks/s.
    Unvoiced regions step at 5 ms = 200 marks/s, always sparser.  The
    capacity must be derived from *time*, not samples — a samples-based
    heuristic (e.g. n//200) truncates every 16 kHz utterance.  Callers
    still detect n_marks == m_max after the kernel (pathological inputs
    can beat 400/s via the monotonicity guard) and fall back to the host
    walk for those utterances.
    """
    return bucket(int(np.ceil(400.0 * n_pad_sig / fs)) + 2, frm_step)


@functools.partial(jax.jit, static_argnames=("fs", "m_max", "frame_step"))
def place_epochs_kernel(y_snap, f0, voiced, n_sig, n_frames=None, *,
                        fs: int, m_max: int, frame_step: float = 0.0):
    """One utterance: (marks[m_max], flags[m_max], n_marks).

    y_snap: low-passed signal (padded); f0/voiced: per-frame track,
    possibly PADDED past ``n_frames`` real frames — the frame lookup
    clips to the last REAL frame (host walk semantics), not the padding.
    ``frame_step``: actual frame spacing in input samples
    (round(FRAME_STEP_S*fs_a)*dec; the nominal 5 ms when omitted).
    """
    T = f0.shape[0]
    if n_frames is None:
        n_frames = jnp.int32(T)
    step = frame_step if frame_step > 0 else FRAME_STEP_S * fs
    unv_step = int(round(0.005 * fs))
    S = y_snap.shape[0]

    snap_w = _snap_win(fs)

    def body(carry):
        t, n_marks, run_len, done, marks, flags = carry
        # t is an INT32 sample position: marks are integers, and float32
        # positions lose sample precision past 2^24 (~350 s at 48 kHz)
        fr = jnp.clip((t.astype(jnp.float32) / step).astype(jnp.int32), 0,
                      jnp.maximum(n_frames - 1, 0))
        is_voi = (voiced[fr] > 0) & (f0[fr] > 0)
        period = jnp.where(is_voi, fs / jnp.maximum(f0[fr], 1.0),
                           float(unv_step))
        # the tracker guarantees f0 >= F0_MIN (lag <= fs_a/F0_MIN); clip
        # so an out-of-contract f0 cannot outrun the snap slice
        period = jnp.minimum(period, fs / 50.0)
        # two-phase snap window (tracker.py SNAP_* rationale): wide
        # re-anchoring for the first marks of a voiced run, narrow after
        wide = run_len < SNAP_ONSET_MARKS
        lo_mult = jnp.where(wide, jnp.float32(1.0 - SNAP_HALF_ONSET),
                            jnp.float32(1.0 - SNAP_HALF_RUN))
        hi_mult = jnp.where(wide, jnp.float32(1.0 + SNAP_HALF_ONSET),
                            jnp.float32(1.0 + SNAP_HALF_RUN))
        # host arithmetic: int(t + x) == t + floor(x) for integer t, x>=0 —
        # keeping t integral makes the window bounds exact at any length
        p_lo = jnp.floor(lo_mult * period).astype(jnp.int32)
        p_hi = jnp.floor(hi_mult * period).astype(jnp.int32)
        lo = t + p_lo
        # window end clips to the REAL signal end (host walk semantics:
        # tracker.place_epochs hi = min(n-1, ...)), not the padded length —
        # otherwise tail marks snap into the zero padding and the walk
        # drops the final voiced mark the host version places
        hi = jnp.minimum(n_sig - 1, t + p_hi)

        # voiced: snap to trough of y_snap in [lo, hi) (half-open, as the
        # host's y_snap[lo:hi] slice).  dynamic_slice (contiguous) instead
        # of gather — the gather form serialises element-at-a-time on TPU.
        # The slice start clamps to S-snap_w for validity; the mask
        # must therefore bound BOTH ends, or pre-window samples become
        # eligible when the clamp engages near the bucket boundary.
        lo_slice = jnp.clip(lo, 0, S - snap_w)
        offs = jnp.arange(snap_w)
        pos = lo_slice + offs
        vals = jax.lax.dynamic_slice(y_snap, (lo_slice,), (snap_w,))
        in_win = (pos >= jnp.maximum(lo, 0)) & (pos < hi)
        vals = jnp.where(in_win, vals, jnp.inf)
        nxt_voi = lo_slice + jnp.argmin(vals).astype(jnp.int32)

        nxt_unv = t + unv_step
        nxt = jnp.where(is_voi, nxt_voi, nxt_unv)
        # monotonicity guard (tracker.place_epochs)
        prev = jnp.where(n_marks > 0, marks[jnp.maximum(n_marks - 1, 0)],
                         -1)
        min_adv = jnp.where(is_voi, jnp.maximum(1, p_lo), 1)
        nxt = jnp.where(nxt <= prev, prev + min_adv, nxt)

        # n_marks < m_max keeps the write in bounds; at capacity the
        # walker stops with n_marks == m_max (callers detect this and
        # fall back to the host walk)
        ok = (~done) & (nxt < n_sig - 1) & (hi > lo + 1) & \
            (n_marks < m_max)
        marks = jnp.where(ok, marks.at[n_marks].set(nxt), marks)
        flags = jnp.where(ok, flags.at[n_marks].set(
            is_voi.astype(jnp.float32)), flags)
        n_marks = jnp.where(ok, n_marks + 1, n_marks)
        run_len = jnp.where(ok & is_voi, run_len + 1,
                            jnp.where(ok, 0, run_len))
        done = done | ~ok
        t = jnp.where(ok, nxt, t)
        return (t, n_marks, run_len, done, marks, flags)

    # while_loop, not fori_loop over m_max: capacity is sized for the
    # worst case (400 marks/s) but real speech places far fewer marks —
    # early exit makes walk cost scale with actual marks.  Under vmap the
    # batched loop runs until every utterance's walker is done.  The body
    # is unrolled _WALK_UNROLL x per iteration: the chain is inherently
    # sequential, but fewer loop iterations means fewer per-step fixed
    # costs (cond eval + vmapped select), the dominant cost of this
    # latency-bound loop on TPU.  `done` makes extra body copies no-ops,
    # so the unroll never overruns.
    def cond(carry):
        return ~carry[3]

    def wbody(carry):
        for _ in range(_WALK_UNROLL):
            carry = body(carry)
        return carry

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.bool_(False),
            jnp.zeros(m_max, jnp.int32), jnp.zeros(m_max, jnp.float32))
    (_, n_marks, _, _, marks, flags) = jax.lax.while_loop(cond, wbody,
                                                          init)
    return marks, flags, n_marks


def _track_one(sig, n_frames, *, fs: int, n_frames_max: int):
    """Device tracking for one utterance: preprocess -> NCCF -> Viterbi.
    Returns the walk inputs (y_snap, f0, voiced) — vmap over the batch."""
    from . import tracker

    fs_a, _dec = tracker.analysis_rate(fs)
    xa, y_snap = tracker._preprocess(sig, fs=fs)
    nccf, valid = tracker._nccf(xa, n_frames, n_frames_max=n_frames_max,
                                fs_a=fs_a,
                                whiten=tracker.nccf_whiten_mode())
    vals, lags = tracker._candidates(nccf)
    states = tracker._viterbi(vals, lags, valid, fs_a=fs_a)

    voiced = (states < tracker.N_CAND) & valid
    # one-hot mask-reduce, not take_along_axis: element gathers from the
    # minor axis lower to scalar-at-a-time fusions on TPU (see
    # tracker._candidates)
    sel = (jnp.arange(tracker.N_CAND)[None, :] ==
           jnp.clip(states, 0, tracker.N_CAND - 1)[:, None])
    lag_sel = jnp.sum(jnp.where(sel, lags, 0.0), axis=1)
    f0 = jnp.where(voiced & (lag_sel > 0),
                   fs_a / jnp.maximum(lag_sel, 1.0), 0.0)
    return y_snap, f0, voiced.astype(jnp.float32)


def _walk_frame_step(fs: int) -> float:
    from . import tracker

    fs_a, dec = tracker.analysis_rate(fs)
    return float(round(tracker.FRAME_STEP_S * fs_a) * dec)


def _use_walk_pallas() -> bool:
    import os
    if os.environ.get("MAGPHASE_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def place_epochs_batch(y_snap, f0, voiced, n_sigs, n_frames, *, fs: int,
                       m_max: int, frame_step: float):
    """Batched epoch walk: Pallas on TPU (VMEM-resident snap signal,
    per-utterance early exit — see pallas_kernels/walk_pallas.py),
    the vmapped lax.while_loop kernel elsewhere.  Sample-exact equals."""
    if _use_walk_pallas():
        from ..pallas_kernels.walk_pallas import place_epochs_pallas

        return place_epochs_pallas(
            y_snap, f0, voiced, n_sigs, n_frames, fs=fs, m_max=m_max,
            frame_step=frame_step, snap_w=_snap_win(fs))
    walk = functools.partial(place_epochs_kernel, fs=fs, m_max=m_max,
                             frame_step=frame_step)
    return jax.vmap(walk)(y_snap, f0, voiced, n_sigs, n_frames)


def track_and_place_batch(sigs, n_sigs, n_frames, *, fs: int,
                          n_frames_max: int, m_max: int):
    """Batched tracking + epoch placement, fully on device.  Call under
    an enclosing jit.  Returns (marks (B, m_max), flags, n_marks)."""
    y_snap, f0, voiced = jax.vmap(functools.partial(
        _track_one, fs=fs, n_frames_max=n_frames_max))(sigs, n_frames)
    return place_epochs_batch(y_snap, f0, voiced, n_sigs, n_frames,
                              fs=fs, m_max=m_max,
                              frame_step=_walk_frame_step(fs))


def track_and_place_one(sig, n_sig, n_frames, *, fs: int,
                        n_frames_max: int, m_max: int):
    """One utterance, fully on device: preprocess -> NCCF -> Viterbi ->
    epoch walk.  Returns (marks[m_max] samples, flags[m_max], n_marks).

    The device half of epochs/tracker.py:extract_epochs.  Production
    batches go through track_and_place_batch (Pallas walk on TPU); this
    per-utterance form keeps the vmappable XLA walk for tests and
    host-walk fallbacks.
    """
    y_snap, f0, voiced = _track_one(sig, n_frames, fs=fs,
                                    n_frames_max=n_frames_max)
    return place_epochs_kernel(y_snap, f0, voiced, n_sig, n_frames,
                               fs=fs, m_max=m_max,
                               frame_step=_walk_frame_step(fs))
