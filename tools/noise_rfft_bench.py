#!/usr/bin/env python
"""Race forward-rfft variants on the synthesis noise shape (TPU).

The fused synthesis spends ~18 ms/iter in noise gen + forward rfft
(tools/synth_breakdown.py); the two-stage f32 matmul DFT is layout-bound
there.  Candidates, scan-loop timed (contention-immune):

  two_stage_f32   matfft.rfft (production, 'highest')
  direct_bf16     matfft.rfft_noise_grade (single (rows,n)x(n,2h) bf16
                  MXU matmul, f32 accumulation)
  native          XLA TPU FFT

Also reports direct_bf16 max abs err vs native on unit-scale noise.

Usage: python tools/noise_rfft_bench.py [rows] [n]
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
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (rows, n)).astype(np.float32))

    impls = {
        "two_stage_f32": lambda a: matfft.rfft(a, n=n),
        "direct_bf16": lambda a: matfft.rfft_noise_grade(a, n=n),
        "direct_high": lambda a: matfft.rfft_direct(a, n=n,
                                                    precision="high"),
        "native": lambda a: jnp.fft.rfft(a, n=n),
    }

    def scan_loop(fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(a, *, iters):
            def body(acc, _):
                z = fn(a * (1.0 + acc * 1e-20))
                return acc + jnp.sum(jnp.abs(z[:, ::257])), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return acc
        return loop

    # correctness: direct_bf16 vs native on-device (complex64 cannot
    # cross the axon link — download re/im floats)
    def _get(fn):
        re, im = jax.jit(lambda a: (fn(a).real, fn(a).imag))(x[:256])
        return jax.device_get(re) + 1j * jax.device_get(im)

    za, zb = _get(impls["direct_bf16"]), _get(impls["native"])
    err = np.max(np.abs(za - zb)) / np.max(np.abs(zb))
    print(f"direct_bf16 max rel err vs native: {err:.2e}", flush=True)

    for name, fn in impls.items():
        loop = scan_loop(fn)
        times = {}
        for iters in (2, 10, 2, 10):
            t0 = time.perf_counter()
            v = float(jax.device_get(loop(x, iters=iters)))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        assert np.isfinite(v)
        per = (min(times[10]) - min(times[2])) / 8.0
        print(f"{name:15s}: {per * 1e3:8.2f} ms/iter  (rows={rows}, n={n})",
              flush=True)


if __name__ == "__main__":
    main()
