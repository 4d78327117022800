"""Pallas TPU kernel for the epoch-placement walk.

The walk (epochs/placement_device.py:place_epochs_kernel, re-stating the
host loop of epochs/tracker.py:place_epochs — reference semantics:
REAPER's epoch placement consumed via libaudio.py:421-447) is a serial
per-mark recurrence: each mark's position feeds the next window search.
As a vmapped ``lax.while_loop`` every trip costs ~31 us of XLA scheduling
plus cross-HBM dynamic slices, and the batch steps in lockstep until the
LONGEST utterance finishes (~9 ms per 24-utterance group, the largest
single latency item in the analysis phase-1 program).

Here each grid step walks ONE utterance with its low-passed snap signal
VMEM-resident (Pallas pipelines the next utterance's signal DMA behind
the current walk), the per-frame f0/voicing track in SMEM for scalar
reads, and the trough search as a single aligned (1, snap_w+128) VPU
window min.  Early exit is per-utterance (sum of real mark counts, not
batch-max), and the per-step cost is scalar-unit latency instead of an
XLA dispatch.

Exactness contract: bit-identical (marks, flags, n_marks) to
``place_epochs_kernel`` — asserted over the demo corpus in
tests/test_walk_pallas.py (interpret mode) and verified on the real chip
inside the production fused kernel (tools/walk_diag.py fused: 0 mark
diffs pallas vs XLA walk).  The float ops (frame lookup, period from f0,
0.7/1.3 window bounds) are the same IEEE f32 operations in both; in
*other* fusion contexts XLA may lower the f32 divides with a different
reciprocal refinement than the Mosaic scalar unit, which can shift a
trough-window boundary by one sample at exact floor() boundaries
(observed once in the synthetic scan harness of tools/walk_bench.py —
±1-sample mark jitter, counts and voicing flags identical).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..epochs.tracker import (SNAP_HALF_ONSET, SNAP_HALF_RUN,
                              SNAP_ONSET_MARKS)

LANE = 128


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _walk_kernel(f0_ref, voi_ref, nsig_ref, nfrm_ref, sig_ref,
                 marks_ref, nm_ref, marks_sc, *,
                 fs: int, m_max: int, frame_step: float, snap_w: int):
    b = pl.program_id(0)
    S = sig_ref.shape[-1]
    W = snap_w + LANE
    n_sig = nsig_ref[b]
    fr_max = jnp.maximum(nfrm_ref[b] - 1, 0)
    unv_step = int(round(0.005 * fs))
    p_max = fs / 50.0        # tracker F0_MIN clip (placement_device.py)

    marks_sc[...] = jnp.zeros_like(marks_sc)

    pos0 = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def cond(c):
        return ~c[2]

    def body(c):
        t, n_marks, done, prev, run_len = c
        fr = jnp.clip((t.astype(jnp.float32) / frame_step)
                      .astype(jnp.int32), 0, fr_max)
        f0 = f0_ref[b, fr]
        is_voi = (voi_ref[b, fr] > 0) & (f0 > 0)
        period = jnp.where(is_voi, fs / jnp.maximum(f0, 1.0),
                           float(unv_step))
        period = jnp.minimum(period, p_max)
        # two-phase snap window — IDENTICAL f32 selects/multiplies to
        # place_epochs_kernel (tracker.py SNAP_* rationale)
        wide = run_len < SNAP_ONSET_MARKS
        lo_mult = jnp.where(wide, jnp.float32(1.0 - SNAP_HALF_ONSET),
                            jnp.float32(1.0 - SNAP_HALF_RUN))
        hi_mult = jnp.where(wide, jnp.float32(1.0 + SNAP_HALF_ONSET),
                            jnp.float32(1.0 + SNAP_HALF_RUN))
        p_lo = jnp.floor(lo_mult * period).astype(jnp.int32)
        p_hi = jnp.floor(hi_mult * period).astype(jnp.int32)
        lo = t + p_lo
        hi = jnp.minimum(n_sig - 1, t + p_hi)

        def trough(_):
            # aligned W-wide window covering [lo, hi): base <= lo (clamped
            # at the signal tail), absolute-position mask instead of a
            # lane rotation; first-minimum tie-break = min position among
            # minima, matching jnp.argmin in the XLA kernel
            base = jnp.clip((lo // LANE) * LANE, 0, S - W)
            base = pl.multiple_of(base, LANE)
            w = sig_ref[0, :, pl.ds(base, W)]
            pos = base + pos0
            vals = jnp.where((pos >= lo) & (pos < hi), w, jnp.inf)
            mn = jnp.min(vals)
            return jnp.min(jnp.where(vals == mn, pos, S))

        # branch, not select: the scalar core skips the window load and
        # VPU min (plus the slow vector->scalar extractions) for every
        # unvoiced step
        nxt = jax.lax.cond(is_voi, trough, lambda _: t + unv_step, None)
        min_adv = jnp.where(is_voi, jnp.maximum(1, p_lo), 1)
        nxt = jnp.where(nxt <= prev, prev + min_adv, nxt)
        ok = (~done) & (nxt < n_sig - 1) & (hi > lo + 1) & \
            (n_marks < m_max)

        @pl.when(ok)
        def _():
            # ONE read-modify-write per mark: the voicing flag rides in
            # the LSB (packed = mark*2 + is_voi, unpacked by the wrapper)
            row = n_marks // LANE
            lane = n_marks % LANE
            packed = nxt * 2 + is_voi.astype(jnp.int32)
            mrow = marks_sc[pl.ds(row, 1), :]
            marks_sc[pl.ds(row, 1), :] = jnp.where(lane_i == lane, packed,
                                                   mrow)

        n_marks = jnp.where(ok, n_marks + 1, n_marks)
        prev = jnp.where(ok, nxt, prev)
        t = jnp.where(ok, nxt, t)
        run_len = jnp.where(ok & is_voi, run_len + 1,
                            jnp.where(ok, 0, run_len))
        return (t, n_marks, done | ~ok, prev, run_len)

    init = (jnp.int32(0), jnp.int32(0), jnp.bool_(False), jnp.int32(-1),
            jnp.int32(0))
    (_, n_marks, _, _, _) = jax.lax.while_loop(cond, body, init)

    marks_ref[0] = marks_sc[...]
    nm_ref[b] = n_marks


def _walk_pallas_call(y_snap, f0, voiced, n_sigs, n_frames, *, fs: int,
                      m_max: int, frame_step: float, snap_w: int):
    B, S = y_snap.shape
    m_rows = m_max // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m_rows, LANE), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole-array SMEM block (Mosaic rejects sub-(8,128) blocks):
            # every program writes its own element
            pl.BlockSpec((B,), lambda b, *_: (0,),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m_rows, LANE), jnp.int32),
        ],
    )
    kern = functools.partial(_walk_kernel, fs=fs, m_max=m_max,
                             frame_step=frame_step, snap_w=snap_w)
    packed, nm = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, m_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=_use_interpret(),
    )(f0, voiced, n_sigs, n_frames, y_snap[:, None, :])
    packed = packed.reshape(B, m_max)
    return (packed >> 1, (packed & 1).astype(jnp.float32), nm)


@functools.partial(jax.jit, static_argnames=("fs", "m_max", "frame_step",
                                             "snap_w"))
def place_epochs_pallas(y_snap, f0, voiced, n_sigs, n_frames, *, fs: int,
                        m_max: int, frame_step: float, snap_w: int):
    """Batched epoch walk.  y_snap: (B, S) f32 with S a multiple of 128
    and >= snap_w+128 (signal buckets are multiples of 32768, satisfying
    both); f0/voiced: (B, T) f32; n_sigs/n_frames: (B,) int32.
    Returns (marks (B, m_max) i32, flags (B, m_max) f32, n_marks (B,)).
    """
    assert y_snap.shape[1] % LANE == 0
    assert y_snap.shape[1] >= snap_w + LANE
    assert y_snap.shape[1] < (1 << 30)   # packed mark = pos*2 + flag
    assert m_max % LANE == 0
    B, T = f0.shape
    n_sigs = n_sigs.astype(jnp.int32)
    n_frames = n_frames.astype(jnp.int32)
    # the f0/voiced tracks are scalar-prefetch operands living whole in
    # SMEM (~1 MB on v5e): bound the per-call footprint by chunking the
    # batch (8 bytes per (utt, frame) entry, budget ~256 KB)
    b_max = max(1, (1 << 15) // T)
    if B <= b_max:
        return _walk_pallas_call(y_snap, f0, voiced, n_sigs, n_frames,
                                 fs=fs, m_max=m_max,
                                 frame_step=frame_step, snap_w=snap_w)
    n_chunks = -(-B // b_max)
    Bp = n_chunks * b_max

    def padr(a):
        pad = Bp - a.shape[0]
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape((n_chunks, b_max) + a.shape[1:])

    marks, flags, nm = jax.lax.map(
        lambda xs: _walk_pallas_call(*xs, fs=fs, m_max=m_max,
                                     frame_step=frame_step, snap_w=snap_w),
        (padr(y_snap), padr(f0), padr(voiced), padr(n_sigs),
         padr(n_frames)))
    return (marks.reshape(Bp, m_max)[:B], flags.reshape(Bp, m_max)[:B],
            nm.reshape(Bp)[:B])
