#!/usr/bin/env python
"""A/B device timing of tracker _preprocess implementations.

Candidates:
  a) current: one 2^k-point rfft over the whole padded signal + 2 irffts
  b) overlap-save blocked FFT conv (batched medium FFTs)
  c) lax.conv_general_dilated direct FIR (stride=dec for the analysis path)

Scan-loop timing (contention-immune); also checks max abs diff vs (a).
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
    from magphase_tpu.epochs import tracker as trk
    from magphase_tpu.utils.padding import bucket_signal, pad_to

    wavs = sorted(glob.glob(
        "/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    B = 24
    batch = [signals[i % len(signals)] for i in range(B)]
    S = bucket_signal(max(len(s) for s in batch))
    sigs = jnp.asarray(np.stack(
        [pad_to(np.asarray(s, np.float32), S) for s in batch]))
    fs = FS
    fs_a, dec = trk.analysis_rate(fs)
    h_hp = trk._fir_highpass(80.0, fs)
    h_lp = trk._fir_lowpass(0.45 * fs_a, fs)
    h_snap = trk._fir_lowpass(800.0, fs)
    taps = len(h_hp)
    # composite analysis response (509 taps), centred like the two-stage
    # 2*off offset in the current preprocess
    h_a = np.convolve(h_hp, h_lp)

    def variant_a(x):
        return trk._preprocess(x, fs=fs)

    # ---- b) overlap-save blocked FFT conv --------------------------------
    NBLK = 16384
    pad_h = len(h_a) - 1                      # 508
    L = NBLK - pad_h                          # valid samples per block

    def os_conv(x, h, nblk=NBLK):
        """'same'-mode conv of x with h via overlap-save blocked FFT.

        Block j's circular conv outputs [ph, nblk) equal the full linear
        conv y_full[j*L .. j*L+L); concatenating gives y_full[0:nblocks*L],
        and same = y_full[off : off+n]."""
        n = x.shape[0]
        ph = len(h) - 1
        off = ph // 2
        Lb = nblk - ph
        nblocks = -(-(n + off) // Lb)
        xp = jnp.concatenate([jnp.zeros(ph, x.dtype), x,
                              jnp.zeros(nblocks * Lb + nblk, x.dtype)])
        idx = (jnp.arange(nblocks) * Lb)[:, None] + jnp.arange(nblk)[None, :]
        blocks = xp[idx]
        H = jnp.asarray(np.fft.rfft(h, n=nblk).astype(np.complex64))
        y = jnp.fft.irfft(jnp.fft.rfft(blocks, n=nblk) * H, n=nblk)
        y_valid = y[:, ph:].reshape(-1)          # = y_full[0:nblocks*L]
        return jax.lax.dynamic_slice(y_valid, (off,), (n,))

    @functools.partial(jax.jit, static_argnames=())
    def variant_b(x):
        xm = x - jnp.mean(x)
        xa = os_conv(xm, h_a)[::dec]
        y_snap = os_conv(xm, h_snap)
        return xa, y_snap

    # ---- c) lax.conv direct FIR ------------------------------------------
    ha_j = jnp.asarray(h_a, jnp.float32)[None, None, :]
    hs_j = jnp.asarray(h_snap, jnp.float32)[None, None, :]

    @functools.partial(jax.jit, static_argnames=())
    def variant_c(x):
        xm = (x - jnp.mean(x))[None, None, :]
        off_a = (len(h_a) - 1) // 2
        off_s = (taps - 1) // 2
        xa = jax.lax.conv_general_dilated(
            xm, ha_j, window_strides=(dec,),
            padding=[(off_a, off_a)])[0, 0]
        y_snap = jax.lax.conv_general_dilated(
            xm, hs_j, window_strides=(1,),
            padding=[(off_s, off_s)])[0, 0]
        return xa, y_snap

    # correctness vs (a)
    x0 = sigs[0]
    xa_a, ys_a = jax.jit(variant_a)(x0)
    n = S
    for name, fn in (("b", variant_b), ("c", variant_c)):
        xa, ys = fn(x0)
        xa_a_h, xa_h = np.asarray(xa_a), np.asarray(xa)
        m = min(len(xa_a_h), len(xa_h)) - 200
        d1 = np.abs(xa_a_h[100:m] - xa_h[100:m]).max()
        d2 = np.abs(np.asarray(ys_a)[100:n-200] -
                    np.asarray(ys)[100:n-200]).max()
        print(f"variant {name}: max|dxa|={d1:.3e} max|dsnap|={d2:.3e}",
              flush=True)

    # timing
    def make_loop(fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(xs, *, iters):
            def body(acc, i):
                xa, ys = jax.vmap(fn)(xs.at[:, 0].set(i.astype(xs.dtype)))
                return acc + jnp.sum(xa[:, ::4096]) + \
                    jnp.sum(ys[:, ::4096]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc
        return loop

    for name, fn in (("a", lambda x: trk._preprocess.__wrapped__(x, fs=fs)),
                     ("b", variant_b.__wrapped__),
                     ("c", variant_c.__wrapped__)):
        loop = make_loop(fn)
        times = {}
        for iters in (1, 9, 1, 9):
            t0 = time.perf_counter()
            jax.device_get(loop(sigs, iters=iters))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        dt = (min(times[9]) - min(times[1])) / 8.0
        print(f"variant {name}: {dt*1e3:7.2f} ms per batch-{B}", flush=True)


if __name__ == "__main__":
    main()
