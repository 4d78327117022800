#!/usr/bin/env python
"""A/B the epoch-walk implementations on the real chip (scan-loop timing).

Modes: the Pallas walk (pallas_kernels/walk_pallas.py) and the vmapped
while_loop walk at several _WALK_UNROLL factors (the unroll amortises
per-iteration overhead; the loop executes ~max-marks bodies regardless).

The checksum cross-check between modes can report a SMALL mismatch
(O(10) over 9 iters): inside this synthetic scan program XLA lowers the
f32 divides with a different reciprocal refinement than the Mosaic
scalar unit, shifting an occasional trough window by one sample.  In
the production fused kernels the two walks are bit-identical on chip
(tools/walk_diag.py fused); a LARGE mismatch here still indicates a bug.
"""
import functools
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 48000


def main():
    import jax
    import jax.numpy as jnp
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab
    from magphase_tpu.epochs import placement_device as pd
    from magphase_tpu.epochs import tracker as trk
    from magphase_tpu.config import define_fft_len

    fs = FS
    wavs = sorted(glob.glob(
        "/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    batch = [signals[i % len(signals)] for i in range(24)]
    group = ab._split_for_budget(batch, fs, define_fft_len(fs), None)[0]
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, fs, None, fft_len=define_fft_len(fs))
    sigs_d, n_sigs_d, n_frames_d = dev
    sigs_f = sigs_d.astype(jnp.float32)

    # precompute the track outputs once (walk inputs)
    fs_a, dec = trk.analysis_rate(fs)
    frame_step = round(trk.FRAME_STEP_S * fs_a) * dec

    @jax.jit
    def track(sigs, n_frames):
        def one(sig, nf):
            xa, y_snap = trk._preprocess(sig, fs=fs)
            nccf, valid = trk._nccf(xa, nf, n_frames_max=Tmax, fs_a=fs_a)
            vals, lags = trk._candidates(nccf)
            states = trk._viterbi(vals, lags, valid, fs_a=fs_a)
            voiced = (states < trk.N_CAND) & valid
            lag_sel = jnp.take_along_axis(
                lags, jnp.clip(states, 0, trk.N_CAND - 1)[:, None],
                axis=1)[:, 0]
            f0 = jnp.where(voiced & (lag_sel > 0),
                           fs_a / jnp.maximum(lag_sel, 1.0), 0.0)
            return y_snap, f0, voiced.astype(jnp.float32)
        return jax.vmap(one)(sigs, n_frames)

    y_snap, f0, voiced = jax.block_until_ready(track(sigs_f, n_frames_d))

    modes = [("pallas", 0)] + [("unroll", u) for u in (2, 4, 8, 16, 32)]
    if "pallas" in sys.argv[1:]:
        modes = [("pallas", 0), ("unroll", 8)]

    ref_marks = None
    for mode, unroll in modes:
        pd._WALK_UNROLL = unroll   # read at trace time; loop is re-jitted
                                   # fresh each pass (new function object)

        @functools.partial(jax.jit, static_argnames=("iters", "mode"))
        def loop(ys, f0a, voi, n_sigs, n_frames, *, iters, mode):
            def body(acc, i):
                ysi = ys.at[:, 0].set(i.astype(ys.dtype) * 1e-9)
                if mode == "pallas":
                    from magphase_tpu.pallas_kernels.walk_pallas import \
                        place_epochs_pallas
                    marks, flags, n_marks = place_epochs_pallas(
                        ysi, f0a, voi, n_sigs.astype(jnp.int32),
                        n_frames.astype(jnp.int32), fs=fs, m_max=m_max,
                        frame_step=float(frame_step),
                        snap_w=pd._snap_win(fs))
                else:
                    walk = functools.partial(
                        pd.place_epochs_kernel.__wrapped__, fs=fs,
                        m_max=m_max, frame_step=float(frame_step))
                    marks, flags, n_marks = jax.vmap(walk)(
                        ysi, f0a, voi, n_sigs)
                return acc + jnp.sum(n_marks) + jnp.sum(marks[:, ::128]), \
                    None
            acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
            return acc

        times = {}
        for iters in (1, 9, 1, 9):
            t0 = time.perf_counter()
            v = int(jax.device_get(loop(y_snap, f0, voiced, n_sigs_d,
                                        n_frames_d, iters=iters,
                                        mode=mode)))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        dt = (min(times[9]) - min(times[1])) / 8.0
        if ref_marks is None:
            ref_marks = v
        ok = "ok" if v == ref_marks else f"MISMATCH {v} != {ref_marks}"
        tag = "pallas   " if mode == "pallas" else f"unroll {unroll:2d}"
        print(f"{tag}: {dt*1e3:6.2f} ms  [{ok}]", flush=True)


if __name__ == "__main__":
    main()
