#!/usr/bin/env python
"""A/B the NCCF segment framing: flattened element gather (current) vs
six stride-aligned slices (reshape trick), scan-loop timed in-context
(preprocess + NCCF + candidates + viterbi)."""
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

    def seg_gather(xa, n_frames_max):
        step = int(round(trk.FRAME_STEP_S * fs_a))
        w = int(round(trk.CORR_WIN_S * fs_a))
        max_lag = int(round(fs_a / trk.F0_MIN))
        seg_len = w + max_lag
        t = jnp.arange(n_frames_max) * step
        idx = t[:, None] + jnp.arange(seg_len)[None, :]
        idx = jnp.clip(idx, 0, xa.shape[0] - 1)
        return jnp.take(xa, idx.reshape(-1)).reshape(idx.shape)

    def seg_slices(xa, n_frames_max):
        step = int(round(trk.FRAME_STEP_S * fs_a))
        w = int(round(trk.CORR_WIN_S * fs_a))
        max_lag = int(round(fs_a / trk.F0_MIN))
        seg_len = w + max_lag
        nj = -(-seg_len // step)                  # 6
        nrows = n_frames_max + nj
        need = nrows * step
        pad = max(0, need - xa.shape[0])
        xa_p = jnp.concatenate([xa, jnp.zeros(pad, xa.dtype)])[:need]
        xa_r = xa_p.reshape(nrows, step)
        parts = [xa_r[j:j + n_frames_max] for j in range(nj)]
        return jnp.concatenate(parts, axis=1)[:, :seg_len]

    def nccf_with(seg_fn, xa, nf):
        step = int(round(trk.FRAME_STEP_S * fs_a))
        w = int(round(trk.CORR_WIN_S * fs_a))
        min_lag = int(fs_a / trk.F0_MAX)
        max_lag = int(round(fs_a / trk.F0_MIN))
        seg_len = w + max_lag
        nfft = 1 << int(np.ceil(np.log2(seg_len + 1)))
        seg = seg_fn(xa, Tmax)
        valid = jnp.arange(Tmax) < nf
        a = jnp.where(jnp.arange(seg_len)[None, :] < w, seg, 0.0)
        A = jnp.fft.rfft(a, n=nfft)
        B = jnp.fft.rfft(seg, n=nfft)
        num = jnp.fft.irfft(jnp.conj(A) * B, n=nfft)[:, :max_lag + 1]
        s2 = jnp.cumsum(seg * seg, axis=1)
        s2 = jnp.concatenate([jnp.zeros_like(s2[:, :1]), s2], axis=1)
        e0 = (s2[:, w] - s2[:, 0])[:, None]
        tau = jnp.arange(max_lag + 1)[None, :]
        e_tau = jnp.take_along_axis(s2, tau + w, axis=1) - \
            jnp.take_along_axis(s2, tau, axis=1)
        nccf = num / jnp.sqrt(e0 * e_tau + 1e-12)
        lag_ok = (tau >= min_lag) & (tau <= max_lag)
        return jnp.where(lag_ok, nccf, -1.0), valid

    def make_loop(seg_fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(sigs, n_frames, *, iters):
            def body(acc, i):
                def one(sig, nf):
                    xa, y_snap = trk._preprocess(
                        sig.at[0].set(i.astype(sig.dtype)), fs=fs)
                    nccf, valid = nccf_with(seg_fn, xa, nf)
                    vals, lags = trk._candidates(nccf)
                    states = trk._viterbi(vals, lags, valid, fs_a=fs_a)
                    return (jnp.sum(states).astype(jnp.float32) +
                            jnp.sum(y_snap[::4096]) + jnp.sum(lags[:, 0]))
                return acc + jnp.sum(jax.vmap(one)(sigs, n_frames)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc
        return loop

    # exactness first (valid frames must be bit-identical)
    xa0, _ = jax.jit(functools.partial(trk._preprocess, fs=fs))(sigs_f[0])
    sg = np.asarray(seg_gather(xa0, Tmax))
    ss = np.asarray(seg_slices(xa0, Tmax))
    nf0 = int(n_frames_d[0])
    exact = np.array_equal(sg[:nf0], ss[:nf0])
    print(f"valid-frame bit-identity: {exact}", flush=True)

    loops = {"gather": make_loop(seg_gather), "slices": make_loop(seg_slices)}
    for rep in range(2):
        for name, loop in loops.items():
            times = {}
            for iters in (1, 9, 1, 9):
                t0 = time.perf_counter()
                jax.device_get(loop(sigs_f, n_frames_d, iters=iters))
                times.setdefault(iters, []).append(
                    time.perf_counter() - t0)
            dt = (min(times[9]) - min(times[1])) / 8.0
            print(f"rep{rep} {name:7s}: {dt*1e3:6.1f} ms "
                  f"({g_audio/dt:7.1f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
