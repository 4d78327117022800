"""Sequential filters re-expressed for TPU.

* median filter (kernel 3) — closed-form elementwise min/max network,
  replacing scipy.signal.medfilt used for F0 smoothing (magphase.py:2202,
  2500; medfilt zero-pads at the edges).
* IIR filtering (Butterworth/elliptic high-pass of magphase.py:990-995,
  1415-1419) — filter design happens host-side with scipy at trace time
  (coefficients are static), and the sequential Direct-Form-II recursion is
  evaluated as a *parallel prefix* over affine state maps with
  jax.lax.associative_scan: state_{t+1} = A state_t + b_t, composed in
  O(log n) depth instead of an O(n) sample loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sp_signal


def medfilt3(v: jnp.ndarray) -> jnp.ndarray:
    """scipy.signal.medfilt(v) with default kernel_size=3 (zero padding)."""
    a = jnp.concatenate([jnp.zeros(1, v.dtype), v[:-1]])
    c = jnp.concatenate([v[1:], jnp.zeros(1, v.dtype)])
    return jnp.maximum(jnp.minimum(a, v),
                       jnp.minimum(jnp.maximum(a, v), c))


@functools.lru_cache(maxsize=16)
def butter_highpass_coeffs(order: int, fc_hz: float, fs: int):
    """Butterworth high-pass (b, a) — magphase.py:990-995."""
    b, a = sp_signal.butter(order, fc_hz / (fs / 2.0), btype="highpass")
    return tuple(b.tolist()), tuple(a.tolist())


@functools.lru_cache(maxsize=16)
def ellip_highpass_coeffs(order: int, rp: float, rs: float, fc_hz: float,
                          fs: int):
    """Elliptic high-pass (b, a) — magphase.py:1415-1419 (0.5 dB / 80 dB)."""
    b, a = sp_signal.ellip(order, rp, rs, fc_hz / (fs / 2.0), btype="highpass")
    return tuple(b.tolist()), tuple(a.tolist())


def lfilter(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """scipy.signal.lfilter(b, a, x) for 1-D x, zero initial state, as an
    associative scan over transposed Direct-Form-II affine updates.

    DF2T recurrence (n = max(len(a), len(b)) - 1):
      y[t]   = b0*x[t] + z0[t]
      zi[t+1]= b_{i+1}*x[t] + z_{i+1}[t] - a_{i+1}*y[t]
    which is affine in the state z: z[t+1] = A z[t] + u[t] x[t].

    WARNING: for high-order filters with poles near the unit circle (e.g. a
    4th-order 40 Hz high-pass at 48 kHz) the companion-matrix products in the
    scan have enormous transient growth and overflow float32 — use
    ``sosfilt`` (cascaded biquads) for those.
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = b / a[0]
    a = a / a[0]
    n = max(len(a), len(b)) - 1
    bp = np.zeros(n + 1)
    ap = np.zeros(n + 1)
    bp[:len(b)] = b
    ap[:len(a)] = a

    # state update matrix: z' = A z + u * x
    A = np.zeros((n, n))
    A[:, 0] = -ap[1:]
    A[:-1, 1:] += np.eye(n - 1)
    u = bp[1:] - ap[1:] * bp[0]

    dtype = x.dtype
    Aj = jnp.asarray(A, dtype)
    uj = jnp.asarray(u, dtype)

    T = x.shape[0]
    As = jnp.broadcast_to(Aj, (T, n, n))
    bs = uj[None, :] * x[:, None]

    def compose(e1, e2):
        A1, b1 = e1
        A2, b2 = e2
        return (jnp.einsum("...ij,...jk->...ik", A2, A1),
                jnp.einsum("...ij,...j->...i", A2, b1) + b2)

    Acum, bcum = jax.lax.associative_scan(compose, (As, bs), axis=0)
    # z[t] (state *before* consuming x[t]) = prefix up to t-1 applied to 0
    z = jnp.concatenate([jnp.zeros((1, n), dtype), bcum[:-1]], axis=0)
    y = bp[0] * x + z[:, 0]
    return y


@functools.lru_cache(maxsize=16)
def butter_highpass_sos(order: int, fc_hz: float, fs: int):
    """Butterworth high-pass as second-order sections (numerically stable
    factorisation of magphase.py:990-995 for float32 device execution)."""
    sos = sp_signal.butter(order, fc_hz / (fs / 2.0), btype="highpass",
                           output="sos")
    return tuple(map(tuple, sos.tolist()))


@functools.lru_cache(maxsize=16)
def _sos_impulse_response(sos, ntaps: int):
    """Exact (float64, scipy) impulse response of the SOS cascade,
    truncated to ``ntaps``."""
    imp = np.zeros(ntaps)
    imp[0] = 1.0
    return sp_signal.sosfilt(np.asarray(sos, np.float64), imp)


def sosfilt(sos, x: jnp.ndarray, ntaps: int = 16384) -> jnp.ndarray:
    """Cascaded-biquad IIR filter (scipy.signal.sosfilt semantics, zero
    initial state) as FFT convolution with the exact truncated impulse
    response.

    Associative-scan prefix products of biquad companion matrices are
    catastrophically unstable in float32 when poles sit near the unit
    circle (the 40 Hz/48 kHz high-pass of magphase.py:990-995 overflows
    within ~2k samples), so the IIR is evaluated in its equivalent FIR
    form instead: h is computed exactly in float64 host-side, and the
    causal convolution runs as one rfft·irfft on device — fully parallel,
    no scan.  For the vocoder's high-pass filters the truncation tail is
    < 1e-12 of peak (pole radius ~0.996 -> |h| decays below 1e-30 well
    before 16384 taps), far below PCM16 resolution."""
    n = x.shape[0]
    h = _sos_impulse_response(tuple(map(tuple, sos)), ntaps)
    L = 1
    while L < n + ntaps:
        L <<= 1
    X = jnp.fft.rfft(x, n=L)
    H = jnp.fft.rfft(jnp.asarray(h, x.dtype), n=L)
    return jnp.fft.irfft(X * H, n=L)[:n].astype(x.dtype)
