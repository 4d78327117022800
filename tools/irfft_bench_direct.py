#!/usr/bin/env python
"""Race irfft variants on the synthesis hot shape (TPU).

  two_stage_f32    matfft.irfft (production two-stage, 'highest')
  direct_high      matfft.irfft_direct precision='high' (3-pass bf16)
  direct_highest   matfft.irfft_direct precision='highest' (6-pass)
  direct_bf16      matfft.irfft_direct precision='default' (1-pass bf16)
  native           XLA TPU irfft

Reports max abs err of each vs native (float64 numpy reference not
available on-device; native f32 is the yardstick).

Usage: python tools/irfft_bench_direct.py [rows] [n]
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
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 40960
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    h = n // 2 + 1
    rng = np.random.RandomState(0)
    re = jnp.asarray(rng.randn(rows, h).astype(np.float32))
    im = jnp.asarray(rng.randn(rows, h).astype(np.float32))

    impls = {
        "two_stage_f32": lambda a, b: matfft.irfft(jax.lax.complex(a, b),
                                                   n=n),
        "direct_high": lambda a, b: matfft.irfft_direct(
            jax.lax.complex(a, b), n=n, precision="high"),
        "direct_highest": lambda a, b: matfft.irfft_direct(
            jax.lax.complex(a, b), n=n, precision="highest"),
        "direct_bf16": lambda a, b: matfft.irfft_direct(
            jax.lax.complex(a, b), n=n, precision="default"),
        "native": lambda a, b: jnp.fft.irfft(jax.lax.complex(a, b), n=n),
    }

    ref = jax.device_get(jax.jit(impls["native"])(re[:256], im[:256]))
    scale = np.max(np.abs(ref))
    for name in ("two_stage_f32", "direct_high", "direct_highest",
                 "direct_bf16"):
        z = jax.device_get(jax.jit(impls[name])(re[:256], im[:256]))
        print(f"{name:15s} max rel err vs native: "
              f"{np.max(np.abs(z - ref)) / scale:.2e}", flush=True)

    def scan_loop(fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(a, b, *, iters):
            def body(acc, _):
                y = fn(a * (1.0 + acc * 1e-20), b)
                return acc + jnp.sum(y[:, ::257]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return acc
        return loop

    for name, fn in impls.items():
        loop = scan_loop(fn)
        times = {}
        for iters in (2, 10, 2, 10):
            t0 = time.perf_counter()
            v = float(jax.device_get(loop(re, im, iters=iters)))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        assert np.isfinite(v)
        per = (min(times[10]) - min(times[2])) / 8.0
        print(f"{name:15s}: {per * 1e3:8.2f} ms/iter  (rows={rows}, n={n})",
              flush=True)


if __name__ == "__main__":
    main()
