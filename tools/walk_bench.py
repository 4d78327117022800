#!/usr/bin/env python
"""A/B the epoch-walk unroll factor on the real chip (scan-loop timing).

The walk while_loop executes ~max-marks bodies regardless of unroll; the
unroll only amortises per-iteration overhead (batched cond + loop
plumbing).  This sweeps _WALK_UNROLL and times the walk kernel alone.
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

    ref_marks = None
    for unroll in (2, 4, 8, 16, 32):
        pd._WALK_UNROLL = unroll   # read at trace time; loop is re-jitted
                                   # fresh each pass (new function object)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(ys, f0a, voi, n_sigs, *, iters):
            def body(acc, i):
                walk = functools.partial(
                    pd.place_epochs_kernel.__wrapped__, fs=fs,
                    m_max=m_max, frame_step=float(frame_step))
                marks, flags, n_marks = jax.vmap(walk)(
                    ys.at[:, 0].set(i.astype(ys.dtype) * 1e-9), f0a, voi,
                    n_sigs)
                return acc + jnp.sum(n_marks) + jnp.sum(marks[:, ::128]), \
                    None
            acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
            return acc

        times = {}
        for iters in (1, 9, 1, 9):
            t0 = time.perf_counter()
            v = int(jax.device_get(loop(y_snap, f0, voiced, n_sigs_d,
                                        iters=iters)))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        dt = (min(times[9]) - min(times[1])) / 8.0
        if ref_marks is None:
            ref_marks = v
        ok = "ok" if v == ref_marks else f"MISMATCH {v} != {ref_marks}"
        print(f"unroll {unroll:2d}: {dt*1e3:6.2f} ms  [{ok}]", flush=True)


if __name__ == "__main__":
    main()
