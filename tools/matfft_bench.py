#!/usr/bin/env python
"""A/B matmul-DFT vs XLA native FFT on the vocoder's hot shapes (TPU).

Times rfft and irfft over (rows, n) with the scan-loop method and checks
max relative error of the matmul path vs the native one on-device.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from magphase_tpu.core import matfft

    os.environ["MAGPHASE_MATFFT"] = "1"
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    for n in (2048, 4096):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(rows, n).astype(np.float32))
        h = n // 2 + 1
        re = jnp.asarray(rng.randn(rows, h).astype(np.float32))
        im = jnp.asarray(rng.randn(rows, h).astype(np.float32))

        @jax.jit
        def make_c(re, im):
            return re + 1j * im      # complex lives on device only

        Xc = make_c(re, im)

        # accuracy on-device (complex can't cross the axon link: compare
        # inside jits that reduce to real scalars)
        @jax.jit
        def cmp_rfft(x):
            a = matfft.rfft(x)
            b = jnp.fft.rfft(x)
            return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(b))

        @jax.jit
        def cmp_irfft(X):
            a = matfft.irfft(X, n=n)
            b = jnp.fft.irfft(X, n=n)
            return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(b))

        d, s = map(float, jax.device_get(cmp_rfft(x[:64])))
        print(f"n={n} rfft rel err: {d/s:.2e}", flush=True)
        di, si = map(float, jax.device_get(cmp_irfft(Xc[:64])))
        print(f"n={n} irfft rel err: {di/si:.2e}", flush=True)

        def timed(fn, arg):
            @functools.partial(jax.jit, static_argnames=("iters",))
            def loop(a, *, iters):
                def body(acc, i):
                    out = fn(a * (1.0 + 1e-9 * i.astype(jnp.float32)))
                    # full reduction: a sliced probe would let XLA narrow
                    # the matmul path's second stage to 8 columns
                    return acc + jnp.sum(jnp.abs(out)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(iters))
                return acc
            times = {}
            for iters in (2, 10, 2, 10):
                t0 = time.perf_counter()
                jax.device_get(loop(arg, iters=iters))
                times.setdefault(iters, []).append(
                    time.perf_counter() - t0)
            return (min(times[10]) - min(times[2])) / 8.0

        for name, fn, arg in (
                ("native rfft ", lambda a: jnp.fft.rfft(a), x),
                ("matmul rfft ", lambda a: matfft.rfft(a), x),
                ("native irfft", lambda a: jnp.fft.irfft(a, n=n), Xc),
                ("matmul irfft", lambda a: matfft.irfft(a, n=n), Xc)):
            dt = timed(fn, arg)
            print(f"n={n} {name}: {dt*1e3:7.2f} ms /{rows} rows",
                  flush=True)


if __name__ == "__main__":
    main()
