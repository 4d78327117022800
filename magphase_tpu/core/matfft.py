"""Batched FFTs as MXU matmuls (two-stage Cooley-Tukey DFT).

XLA's native TPU FFT runs the vocoder's hot (rows, 2048/4096)-point
transforms at ~200 GFLOP/s — it is latency/VPU-bound, not MXU-bound
(measured: the two FFT stages are 40 of 55 ms of the fused synthesis
iteration).  A DFT factorised as two small dense matmuls plus a twiddle
multiply does ~4x the naive FFT FLOPs but runs on the MXU, which is
orders faster for this shape.  For n = n1*n2 with index split
j = j1*n2 + j2, k = k2*n1 + k1:

    X[k2*n1 + k1] = sum_j2 D2[j2,k2] * W_n^(k1*j2) * sum_j1 D1[j1,k1] x[j1*n2+j2]

i.e. matmul over j1 (n1-point DFTs), twiddle, matmul over j2 (n2-point
DFTs), transpose.  All matrices are trace-time constants.

Precision: matmuls run at precision='highest' (6-pass bf16 on TPU,
~float32 accuracy); max abs error vs jnp.fft on unit-scale speech frames
is ~1e-5 at n=4096 — far below the float16 feature-transfer quantisation
of the compressed pipelines these kernels serve.  The LOSSLESS pipeline
keeps XLA's native FFT (its round trip is asserted to ~1e-7).

MAGPHASE_MATFFT=0 falls back to jnp.fft everywhere; =1 forces the matmul
path even off-TPU (CPU tests); unset = matmul on TPU only.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _split(n: int) -> tuple[int, int]:
    """Factor n = n1*n2 with both factors near sqrt(n) (n power of two)."""
    lg = int(round(np.log2(n)))
    assert 1 << lg == n, f"matfft needs a power-of-two length, got {n}"
    n1 = 1 << ((lg + 1) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=32)
def _dft_consts(n: int, inverse: bool):
    """(D1_re, D1_im, TW, D2) trace-time constants for the two stages."""
    n1, n2 = _split(n)
    sign = 2j if inverse else -2j
    j1 = np.arange(n1)
    D1 = np.exp(sign * np.pi * np.outer(j1, j1) / n1)          # (j1, k1)
    k1 = np.arange(n1)[:, None]
    j2 = np.arange(n2)[None, :]
    TW = np.exp(sign * np.pi * k1 * j2 / n)                    # (k1, j2)
    jj2 = np.arange(n2)
    D2 = np.exp(sign * np.pi * np.outer(jj2, jj2) / n2)        # (j2, k2)
    return (D1.real.astype(np.float32), D1.imag.astype(np.float32),
            TW.astype(np.complex64), D2.astype(np.complex64))


def _dft_real_input(x: jnp.ndarray, n: int, inverse: bool) -> jnp.ndarray:
    """Full complex DFT of REAL x (..., n) via two matmul stages."""
    n1, n2 = _split(n)
    D1r, D1i, TW, D2 = _dft_consts(n, inverse)
    lead = x.shape[:-1]
    xr = x.reshape(-1, n1, n2)                                  # [b, j1, j2]
    # stage 1 over j1: A[b, k1, j2] — real input, two real matmuls
    Ar = jnp.einsum("bjs,jk->bks", xr, jnp.asarray(D1r),
                    precision="highest")
    Ai = jnp.einsum("bjs,jk->bks", xr, jnp.asarray(D1i),
                    precision="highest")
    A = (Ar + 1j * Ai) * jnp.asarray(TW)[None]
    # stage 2 over j2: C[b, k1, k2]
    C = jnp.einsum("bks,st->bkt", A, jnp.asarray(D2),
                   precision="highest")
    # k = k2*n1 + k1
    return C.transpose(0, 2, 1).reshape(*lead, n)


def _dft_complex_input(z: jnp.ndarray, n: int,
                       inverse: bool) -> jnp.ndarray:
    """Full complex DFT of complex z (..., n) via two matmul stages."""
    n1, n2 = _split(n)
    D1r, D1i, TW, D2 = _dft_consts(n, inverse)
    lead = z.shape[:-1]
    zr = z.reshape(-1, n1, n2)
    D1 = jnp.asarray(D1r) + 1j * jnp.asarray(D1i)
    A = jnp.einsum("bjs,jk->bks", zr, D1, precision="highest")
    A = A * jnp.asarray(TW)[None]
    C = jnp.einsum("bks,st->bkt", A, jnp.asarray(D2),
                   precision="highest")
    return C.transpose(0, 2, 1).reshape(*lead, n)


def _use_native() -> bool:
    v = os.environ.get("MAGPHASE_MATFFT", "")
    if v == "1":
        return False
    if v == "0":
        return True
    return jax.default_backend() != "tpu"


def rfft(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """jnp.fft.rfft(x, n) — MXU matmul DFT on TPU, native elsewhere."""
    if n is None:
        n = x.shape[-1]
    if _use_native() or (n & (n - 1)):
        return jnp.fft.rfft(x, n=n)
    if x.shape[-1] != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    return _dft_real_input(x.astype(jnp.float32), n,
                           inverse=False)[..., :n // 2 + 1]


def irfft(X: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """jnp.fft.irfft(X, n) — MXU matmul DFT on TPU, native elsewhere."""
    if n is None:
        n = 2 * (X.shape[-1] - 1)
    if _use_native() or (n & (n - 1)):
        return jnp.fft.irfft(X, n=n)
    h = n // 2 + 1
    X = X[..., :h]
    # hermitian extension X[n-k] = conj(X[k]) for k = 1..n/2-1
    tail = jnp.conj(X[..., 1:-1][..., ::-1])
    Xf = jnp.concatenate([X, tail], axis=-1)
    y = _dft_complex_input(Xf, n, inverse=True)
    return (y.real / n).astype(jnp.float32)
