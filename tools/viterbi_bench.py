#!/usr/bin/env python
"""Reliable device cost of the Viterbi stage: A/B the full track kernel
against the same kernel with _viterbi stubbed to a cheap argmin, both
consuming equivalent outputs (scan-loop timing, one process)."""
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
    from magphase_tpu.epochs import tracker as trk
    from magphase_tpu.config import define_fft_len

    fs = FS
    wavs = sorted(glob.glob(
        "/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    batch = [signals[i % len(signals)] for i in range(24)]
    group = ab._split_for_budget(batch, fs, define_fft_len(fs), None)[0]
    g_audio = sum(len(s) for s in group) / fs
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, fs, None, fft_len=define_fft_len(fs))
    sigs_d, n_sigs_d, n_frames_d = dev
    sigs_f = sigs_d.astype(jnp.float32) * (1.0 / 32768.0)
    fs_a = trk.analysis_rate(fs)[0]

    def make_loop(use_viterbi):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(sigs, n_frames, *, iters):
            def body(acc, i):
                def one(sig, nf):
                    xa, y_snap = trk._preprocess(
                        sig.at[0].set(i.astype(sig.dtype)), fs=fs)
                    nccf, valid = trk._nccf(xa, nf, n_frames_max=Tmax,
                                            fs_a=fs_a)
                    vals, lags = trk._candidates(nccf)
                    if use_viterbi:
                        states = trk._viterbi(vals, lags, valid, fs_a=fs_a)
                    else:
                        # same output shape/consumption, no DP scan
                        states = jnp.argmin(vals, axis=1)
                    return (jnp.sum(states).astype(jnp.float32) +
                            jnp.sum(y_snap[::4096]) + jnp.sum(lags[:, 0]))
                return acc + jnp.sum(jax.vmap(one)(sigs, n_frames)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc
        return loop

    loops = {"with_viterbi": make_loop(True), "no_viterbi": make_loop(False)}
    for rep in range(2):
        for name, loop in loops.items():
            times = {}
            for iters in (1, 9, 1, 9):
                t0 = time.perf_counter()
                jax.device_get(loop(sigs_f, n_frames_d, iters=iters))
                times.setdefault(iters, []).append(
                    time.perf_counter() - t0)
            dt = (min(times[9]) - min(times[1])) / 8.0
            print(f"rep{rep} {name:13s}: {dt*1e3:6.1f} ms "
                  f"({g_audio/dt:7.1f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
