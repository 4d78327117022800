"""Remaining DSP utility surface of libaudio.py / magphase.py.

interp_unv_regions      libaudio.py:273-291
smooth_by_conv          libaudio.py:878-918
windowing_const_rate    libaudio.py:505-533  (+ GetNFramesFromSigLen 537-543)
mcep_to_lin_sp_log      libaudio.py:548-558
cos_win                 libaudio.py:145-148
hz_to_bin / bin_to_hz   libaudio.py:151-155
next_pow_of_two         libaudio.py:495-502
ph_enc / ph_dec         magphase.py:423-441
win_squared             magphase.py:2472-2477
get_ap_mask_from_uv_decision  magphase.py:1979-1996
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interp_unv_regions(m_data: jnp.ndarray, v_voi: jnp.ndarray,
                       interp_type: str = "linear") -> jnp.ndarray:
    """Interpolate feature rows across unvoiced gaps (libaudio.py:273-291).

    'zeros' zeroes unvoiced rows; 'linear' linearly interpolates between
    surrounding voiced rows (edge regions clamp to the first/last voiced
    row, matching the reference's fill_value behaviour).
    """
    vb = v_voi > 0
    if interp_type == "zeros":
        return m_data * vb[:, None].astype(m_data.dtype)

    import jax
    n = m_data.shape[0]
    idx = jnp.arange(n)
    # nearest voiced row at/before i, and at/after i
    prev_v = jax.lax.cummax(jnp.where(vb, idx, -1))
    next_v = n - 1 - jax.lax.cummax(jnp.where(vb[::-1], idx, -1))[::-1]
    first = jnp.argmax(vb)
    last = n - 1 - jnp.argmax(vb[::-1])
    prev_v = jnp.clip(jnp.where(prev_v < 0, first, prev_v), 0, n - 1)
    next_v = jnp.clip(jnp.where(next_v > last, last, next_v), 0, n - 1)
    d_prev = m_data[prev_v]
    d_next = m_data[next_v]
    span = jnp.maximum(next_v - prev_v, 1)
    w = ((idx - prev_v) / span)[:, None].astype(m_data.dtype)
    interp = d_prev + w * (d_next - d_prev)
    same = (next_v == prev_v)[:, None]
    out = jnp.where(same, d_prev, interp)
    return jnp.where(vb[:, None], m_data, out)


def smooth_by_conv(m_data: jnp.ndarray, v_win=None) -> jnp.ndarray:
    """Boundary-extended moving-average smoother along axis 0
    (libaudio.py:878-918)."""
    if v_win is None:
        v_win = np.hanning(11)
    v_win = np.asarray(v_win, np.float64)
    win_len = len(v_win)
    if win_len < 3:
        return m_data
    half = (win_len - 1) // 2
    k = jnp.asarray(v_win / v_win.sum(), m_data.dtype)

    one_d = m_data.ndim == 1
    if one_d:
        m_data = m_data[:, None]
    top = jnp.repeat(m_data[:1], half, axis=0)
    bot = jnp.repeat(m_data[-1:], half, axis=0)
    ext = jnp.concatenate([top, m_data, bot], axis=0)
    # 'valid' convolution per column
    n = m_data.shape[0]
    idx = jnp.arange(n)[:, None] + jnp.arange(win_len)[None, :]
    gath = ext[idx]                       # (n, win_len, d)
    out = jnp.einsum("nwd,w->nd", gath, k)
    return out[:, 0] if one_d else out


def windowing_const_rate(v_sig: jnp.ndarray, winlen: int, shift: int,
                         winfunc=np.hanning, extend: str = "none"):
    """Constant frame-rate windowing (libaudio.py:505-533)."""
    shift = int(shift)
    v_win = jnp.asarray(winfunc(winlen), v_sig.dtype)
    if extend in ("both", "beg"):
        v_sig = jnp.concatenate(
            [jnp.zeros(winlen // 2, v_sig.dtype), v_sig])
    if extend in ("both", "end"):
        v_sig = jnp.concatenate([v_sig, jnp.zeros(winlen, v_sig.dtype)])
    n_frms = int(np.floor(1 + (v_sig.shape[0] - winlen) / float(shift)))
    idx = (jnp.arange(n_frms) * shift)[:, None] + jnp.arange(winlen)[None, :]
    return v_sig[idx] * v_win[None, :]


def get_n_frames_from_sig_len(sig_len: int, shift_ms: float, fs: int) -> int:
    """libaudio.py:537-543."""
    shift = round(fs * shift_ms / 1000)
    return int(np.ceil(1 + ((sig_len - 1) / shift)))


def mcep_to_lin_sp_log(m_mgc: jnp.ndarray, nFFT: int) -> jnp.ndarray:
    """mcep -> log spectrum without warping (libaudio.py:548-558)."""
    n_frms, n_coeffs = m_mgc.shape
    half = nFFT // 2 + 1
    pad = jnp.zeros((n_frms, nFFT // 2 - n_coeffs + 1), m_mgc.dtype)
    m = jnp.concatenate([m_mgc, pad], axis=1)
    m = jnp.concatenate([m, m[:, -2:0:-1]], axis=1)
    return jnp.fft.fft(m, n=nFFT).real[:, :half]


def cos_win(N: int) -> np.ndarray:
    """sin half-wave window; cos_win**2 == hanning (libaudio.py:145-148)."""
    return np.sin(np.linspace(0, np.pi, N))


def hz_to_bin(v_hz, nFFT: int, fs: int):
    return np.asarray(v_hz) * nFFT / float(fs)


def bin_to_hz(v_bin, nFFT: int, fs: int):
    return np.asarray(v_bin) * fs / float(nFFT)


def next_pow_of_two(x) -> int:
    x = max(x, 2)
    return int(2 ** np.ceil(np.log2(x)))


def ph_enc(m_ph):
    """phase -> (sin, cos) (magphase.py:423-426)."""
    return jnp.sin(m_ph), jnp.cos(m_ph)


def ph_dec(m_phs, m_phc, mode: str = "angle"):
    """(sin, cos) -> phase (magphase.py:431-441)."""
    if mode == "sign":
        m_bs = jnp.arcsin(m_phs)
        m_bc = jnp.arccos(m_phc)
        return jnp.sign(m_bs) * jnp.abs(m_bc)
    if mode == "angle":
        return jnp.angle(m_phc + 1j * m_phs)
    raise ValueError(mode)


def win_squared(L: int) -> np.ndarray:
    """Centre-half boxcar (magphase.py:2472-2477)."""
    v = np.zeros(L)
    q, h = int(np.floor(L / 4.0)), int(np.floor(L / 2.0))
    v[q:q + h] = 1.0
    return v


def get_ap_mask_from_uv_decision(v_voi, nFFT: int, fs: int, mvf: float,
                                 fade_len: int = 40):
    """Legacy aperiodicity mask (magphase.py:1979-1996)."""
    v_voi = jnp.asarray(v_voi)
    mvf_bin = int(np.round(mvf * nFFT / float(fs)))
    v_ap = 1.0 - jnp.clip(v_voi, 0, 1)
    m = jnp.tile(v_ap[:, None], (1, mvf_bin))
    ramp = jnp.asarray(np.linspace(1, 0, fade_len))
    m = 1.0 - m
    m = m.at[:, -fade_len:].mul(ramp[None, :])
    m = 1.0 - m
    half = nFFT // 2 + 1
    return jnp.concatenate(
        [m, jnp.ones((v_voi.shape[0], half - mvf_bin), m.dtype)], axis=1)
