"""Batched FFTs as MXU matmuls (two-stage Cooley-Tukey DFT).

XLA's native TPU FFT runs the vocoder's hot (rows, 2048/4096)-point
transforms at ~200 GFLOP/s — it is latency/VPU-bound, not MXU-bound
(measured: the two FFT stages are 40 of 55 ms of the fused synthesis
iteration).  A DFT factorised as two small dense matmuls plus a twiddle
multiply does ~4x the naive FFT FLOPs but runs on the MXU.  For
n = n1*n2 with index split j = j1*n2 + j2, k = k2*n1 + k1:

    X[k2*n1 + k1] = sum_j2 D2[j2,k2] * W_n^(k1*j2) * sum_j1 D1[j1,k1] x[j1*n2+j2]

i.e. matmul over j1 (n1-point DFTs), twiddle, matmul over j2 (n2-point
DFTs), transpose.  All matrices are trace-time constants.

Everything is REAL arithmetic on real float32 constants: complex
multiplies are written out as +/- products of (re, im) parts, and the
complex result is assembled only at the very end (rfft) or never (irfft
returns its real part straight from two real matmuls, skipping the two
that would produce the ~0 imaginary part).  This is deliberate and
load-bearing, not a style choice: embedding complex64 CONSTANTS in a
program corrupts results on the axon-tunnelled TPU backend (measured:
a lossless copy-synthesis program containing complex constants returns
p99~9e-2 reconstructions from EVERY subgraph — even ones not touching
the constants — while the same program with real constants is exact to
1e-7; complex64 transfers on this link are UNIMPLEMENTED and hoisted
constants appear to hit the same path).

Precision: matmuls run at precision='highest' (6-pass bf16 on TPU,
~float32 accuracy); max abs error vs jnp.fft on unit-scale speech frames
is ~1e-5 at n=4096 (measured rel err ~3e-7 on-device) — far below the
float16 feature-transfer quantisation of the compressed pipelines these
kernels serve, and the lossless round trip through them stays sub-PCM16.

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
    """Real/imag parts of (D1, TW, D2) as float32 trace-time constants."""
    n1, n2 = _split(n)
    sign = 2j if inverse else -2j
    j1 = np.arange(n1)
    D1 = np.exp(sign * np.pi * np.outer(j1, j1) / n1)          # (j1, k1)
    k1 = np.arange(n1)[:, None]
    j2 = np.arange(n2)[None, :]
    TW = np.exp(sign * np.pi * k1 * j2 / n)                    # (k1, j2)
    jj2 = np.arange(n2)
    D2 = np.exp(sign * np.pi * np.outer(jj2, jj2) / n2)        # (j2, k2)
    f32 = lambda a: a.astype(np.float32)
    return (f32(D1.real), f32(D1.imag), f32(TW.real), f32(TW.imag),
            f32(D2.real), f32(D2.imag))


def _stages_real_input(x: jnp.ndarray, n: int, inverse: bool,
                       precision: str = "highest"):
    """(Re, Im) of the full complex DFT of REAL x (..., n), real math."""
    _MM = functools.partial(jnp.einsum, precision=precision)
    n1, n2 = _split(n)
    D1r, D1i, TWr, TWi, D2r, D2i = map(jnp.asarray, _dft_consts(n, inverse))
    lead = x.shape[:-1]
    xr = x.reshape(-1, n1, n2)                                  # [b, j1, j2]
    # stage 1 over j1 (real input -> two real matmuls), then twiddle
    Ar = _MM("bjs,jk->bks", xr, D1r)
    Ai = _MM("bjs,jk->bks", xr, D1i)
    Br = Ar * TWr - Ai * TWi
    Bi = Ar * TWi + Ai * TWr
    # stage 2 over j2 (complex x complex as four real matmuls)
    Cr = _MM("bks,st->bkt", Br, D2r) - _MM("bks,st->bkt", Bi, D2i)
    Ci = _MM("bks,st->bkt", Br, D2i) + _MM("bks,st->bkt", Bi, D2r)
    # k = k2*n1 + k1
    return (Cr.transpose(0, 2, 1).reshape(*lead, n),
            Ci.transpose(0, 2, 1).reshape(*lead, n))


def _inverse_real_output(zr: jnp.ndarray, zi: jnp.ndarray, n: int,
                         precision: str = "highest") -> jnp.ndarray:
    """Real output of the inverse DFT given only the h = n/2+1 bins
    (zr, zi) of a hermitian spectrum, WITHOUT building the mirrored tail.

    y[t] = (1/n) [X[0] + 2 sum_{k=1..n/2-1} Re(X[k] e^{+2pi i kt/n})
                  + X[n/2] (-1)^t]
         = Re( sum_{k=0..n/2} w[k] X[k] e^{+2pi i kt/n} ),
    with w = [1, 2, ..., 2, 1]/n — i.e. the inverse stages applied to the
    weighted spectrum zero-padded from h to n along k.  The pad lands the
    zeros in the upper half of the j1 axis after the (n1, n2) reshape, so
    stage 1 only contracts the first n1/2+1 rows.  Two of the four stage-2
    matmuls vanish because only the real output is needed.

    No mirrored-tail assembly: a reverse+negate+concatenate spectrum
    extension was observed to MISCOMPILE on the axon-tunnelled TPU backend
    inside large fused programs (the imaginary tail read back as zeros,
    err = -odd(frame)/2 exactly); zero-padding avoids the pattern.
    """
    _MM = functools.partial(jnp.einsum, precision=precision)
    n1, n2 = _split(n)
    h = n // 2 + 1
    D1r, D1i, TWr, TWi, D2r, D2i = map(jnp.asarray, _dft_consts(n, True))
    w = jnp.asarray(hermitian_fold_weights(n))
    lead = zr.shape[:-1]
    # weighted half-spectrum, reshaped so k = j1*n2 + j2; rows of j1 past
    # the occupied prefix are identically zero and never touched
    j1_used = min(-(-h // n2), n1)              # ceil over occupied rows
    pad = j1_used * n2 - h
    ar = jnp.pad(zr * w, [(0, 0)] * (zr.ndim - 1) + [(0, pad)])
    ai = jnp.pad(zi * w, [(0, 0)] * (zi.ndim - 1) + [(0, pad)])
    ar = ar.reshape(-1, j1_used, n2)
    ai = ai.reshape(-1, j1_used, n2)
    D1r_u, D1i_u = D1r[:j1_used], D1i[:j1_used]
    Ar = _MM("bjs,jk->bks", ar, D1r_u) - _MM("bjs,jk->bks", ai, D1i_u)
    Ai = _MM("bjs,jk->bks", ar, D1i_u) + _MM("bjs,jk->bks", ai, D1r_u)
    Br = Ar * TWr - Ai * TWi
    Bi = Ar * TWi + Ai * TWr
    Cr = _MM("bks,st->bkt", Br, D2r) - _MM("bks,st->bkt", Bi, D2i)
    return Cr.transpose(0, 2, 1).reshape(*lead, n)


def hermitian_fold_weights(n: int) -> np.ndarray:
    """Per-bin weights [1, 2, ..., 2, 1]/n that fold the hermitian mirror
    of an irfft input into its h = n/2+1 stored bins (so no reversed tail
    is ever built — the miscompile-avoidance scheme shared by
    _inverse_real_output and tools/dft_pallas.py)."""
    h = n // 2 + 1
    w = np.full(h, 2.0, np.float32) / n
    w[0] = 1.0 / n
    w[-1] = 1.0 / n
    return w


@functools.lru_cache(maxsize=8)
def _rfft_direct_consts(n: int):
    """(n, 2h) packed [cos | sin] forward-DFT matrix (real float32).

    One dense matmul computes the full rfft: columns are cos(-2pi t k / n)
    and sin(-2pi t k / n), so y = x @ W gives y[..., :h] = Re(X) and
    y[..., h:] = Im(X) directly.  4x the FLOPs of the two-stage split but
    ZERO intermediate
    relayouts — the two-stage form is layout-bound on TPU (measured:
    3-pass vs 6-pass identical), so for noise-grade precision a single
    bf16 MXU pass wins (see rfft_noise_grade).
    """
    h = n // 2 + 1
    t = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(h)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * t * k / n
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(
        np.float32)


def rfft_direct(x: jnp.ndarray, n: int | None = None,
                precision: str = "high") -> jnp.ndarray:
    """rfft as ONE (rows, n) x (n, 2h) matmul at the given einsum
    precision ('high' = 3-pass bf16 operand splitting, ~f32 accuracy —
    the f32 accumulation dominates the error).  Single clean matmul, no
    intermediate relayouts (cf. the layout-bound two-stage form).
    Off-TPU falls back to the native rfft."""
    if n is None:
        n = x.shape[-1]
    if _use_native() or (n & (n - 1)) or x.dtype == jnp.float64:
        return jnp.fft.rfft(x, n=n)
    if x.shape[-1] > n:
        x = x[..., :n]
    elif x.shape[-1] < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    W = jnp.asarray(_rfft_direct_consts(n))
    h = n // 2 + 1
    y = jnp.einsum("...t,tk->...k", x.astype(jnp.float32), W,
                   precision=precision)
    return jax.lax.complex(y[..., :h], y[..., h:])


def rfft_noise_grade(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """rfft for NOISE-GRADE inputs: single (rows, n) x (n, 2h) bf16 MXU
    matmul (f32 accumulation), rel err ~4e-3 — three orders below any
    meaning carried by a white-noise excitation spectrum, and 5-10x less
    device time than the layout-bound two-stage f32 path on the synthesis
    pipeline's hot shapes.  Off-TPU (CPU tests) falls back to the exact
    native rfft.  MAGPHASE_NOISE_RFFT=f32 forces the exact path on TPU
    for A/B."""
    if n is None:
        n = x.shape[-1]
    if (_use_native() or (n & (n - 1)) or x.dtype == jnp.float64
            or os.environ.get("MAGPHASE_NOISE_RFFT") == "f32"):
        return rfft(x, n=n)
    if x.shape[-1] > n:
        x = x[..., :n]
    elif x.shape[-1] < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    W = jnp.asarray(_rfft_direct_consts(n), jnp.bfloat16)
    h = n // 2 + 1
    y = jnp.dot(x.astype(jnp.bfloat16), W,
                preferred_element_type=jnp.float32)
    return jax.lax.complex(y[..., :h], y[..., h:])


@functools.lru_cache(maxsize=8)
def _irfft_direct_consts(n: int):
    """(2h, n) stacked [cos-weighted | sin-weighted] inverse-DFT matrix.

    y[t] = sum_k w[k] (Re X[k] cos(2pi kt/n) - Im X[k] sin(2pi kt/n))
    with the hermitian fold weights w = [1, 2, .., 2, 1]/n, so one matmul
    of the packed (rows, 2h) [Re | Im] operand computes the full irfft
    with zero intermediate relayouts (the two-stage split is layout-bound
    on TPU; see rfft_noise_grade).
    """
    h = n // 2 + 1
    w = hermitian_fold_weights(n).astype(np.float64)[:, None]
    k = np.arange(h)[:, None].astype(np.float64)
    t = np.arange(n)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * t / n
    return np.concatenate([w * np.cos(ang), -w * np.sin(ang)],
                          axis=0).astype(np.float32)


def irfft_direct(X: jnp.ndarray, n: int | None = None,
                 precision: str = "high") -> jnp.ndarray:
    """jnp.fft.irfft as ONE (rows, 2h) x (2h, n) matmul.  At
    precision='high' (3-pass bf16 operand splitting, f32 accumulation)
    the result carries ~f32 accuracy — the error is dominated by the f32
    accumulation either way — at half the MXU passes of 'highest', and
    the single clean large matmul avoids the two-stage form's layout
    overhead.  Off-TPU falls back to the native irfft."""
    if n is None:
        n = 2 * (X.shape[-1] - 1)
    if _use_native() or (n & (n - 1)) or X.dtype == jnp.complex128:
        return jnp.fft.irfft(X, n=n)
    h = n // 2 + 1
    X = X[..., :h]
    W = jnp.asarray(_irfft_direct_consts(n))
    z = jnp.concatenate([X.real, X.imag], axis=-1)
    return jnp.einsum("...k,kt->...t", z, W,
                      precision=precision).astype(jnp.float32)


def _use_native() -> bool:
    v = os.environ.get("MAGPHASE_MATFFT", "")
    if v == "1":
        return False
    if v == "0":
        return True
    return jax.default_backend() != "tpu"


def rfft(x: jnp.ndarray, n: int | None = None,
         precision: str = "highest") -> jnp.ndarray:
    """jnp.fft.rfft(x, n) — MXU matmul DFT on TPU, native elsewhere.

    precision: 'highest' (6-pass bf16, ~f32 accuracy, the default) or
    'high' (3-pass).  Measured on v5e: 'high' does NOT speed up the fused
    synthesis at all (4423 vs 4425 audio-s/s) — these batched small-tile
    matmuls are layout/HBM-bound, not MXU-pass-bound — so production
    callsites keep 'highest'.  A fused Pallas DFT that holds all stages in
    VMEM is the remaining headroom here."""
    if n is None:
        n = x.shape[-1]
    if _use_native() or (n & (n - 1)) or x.dtype == jnp.float64:
        return jnp.fft.rfft(x, n=n)     # f64 callers keep full precision
    if x.shape[-1] > n:
        x = x[..., :n]                  # jnp.fft.rfft truncation semantics
    elif x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    re, im = _stages_real_input(x.astype(jnp.float32), n, inverse=False,
                                precision=precision)
    h = n // 2 + 1
    return jax.lax.complex(re[..., :h], im[..., :h])


def irfft(X: jnp.ndarray, n: int | None = None,
          precision: str = "highest") -> jnp.ndarray:
    """jnp.fft.irfft(X, n) — MXU matmul DFT on TPU, native elsewhere.
    See rfft for the precision knob."""
    if n is None:
        n = 2 * (X.shape[-1] - 1)
    if _use_native() or (n & (n - 1)) or X.dtype == jnp.complex128:
        return jnp.fft.irfft(X, n=n)    # f64 callers keep full precision
    h = n // 2 + 1
    X = X[..., :h]
    # no hermitian tail is built — _inverse_real_output folds the mirror
    # symmetry into per-bin weights (see its docstring for why)
    y = _inverse_real_output(X.real, X.imag, n, precision=precision)
    return y.astype(jnp.float32)
