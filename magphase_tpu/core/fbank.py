"""Filter-bank mel warp family (experimental paths of the reference).

References: apply_fbank (libaudio.py:721-761), sp_mel_warp_fbank (763-769),
sp_mel_unwarp_fbank (815-845), unwarp_from_fbank (848-874),
build_mel_curve (711-718).  These back the fbank phase-compression
variants (phase_uncompress_fbank magphase.py:798-820,
format_for_modelling_phase_comp 2547-2578).

The filter bank is a fixed (nbins, nbands) matrix per (alpha, nbins,
nbands) — precomputed host-side, applied as one matmul on device.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from scipy import interpolate

from .melcep import mm
from .spectral import mel_curve_np, protected_log
from .windows import gen_non_symmetric_win_np


@functools.lru_cache(maxsize=16)
def _fbank_matrix_np(alpha: float, nbins: int, nbands: int) -> np.ndarray:
    """Triangular-ish averaging filter bank on the warped grid
    (apply_fbank 'average' mode, libaudio.py:721-753)."""
    v_bins_warp = mel_curve_np(alpha, nbins)
    v_cntrs_mel = np.linspace(0, v_bins_warp[-1], nbands)
    f_interp = interpolate.interp1d(v_bins_warp, np.arange(nbins),
                                    kind="quadratic")
    v_cntrs = np.round(f_interp(v_cntrs_mel)).astype(int)

    m_fbank = np.zeros((nbins, nbands))
    v_ext = np.r_[v_cntrs[0], v_cntrs, v_cntrs[-1]]
    for nxb in range(1, nbands + 1):
        wl = v_ext[nxb] - v_ext[nxb - 1]
        wr = v_ext[nxb + 1] - v_ext[nxb]
        v_win = gen_non_symmetric_win_np(wl, wr, np.hanning, b_norm=True)
        m_fbank[v_ext[nxb - 1]:v_ext[nxb - 1] + len(v_win), nxb - 1] = v_win
    return m_fbank


@functools.lru_cache(maxsize=16)
def _unwarp_interp_matrix_np(alpha: float, nbins: int, nbands: int,
                             kind: str = "quadratic") -> np.ndarray:
    """(nbands, nbins) interpolation matrix for unwarp_from_fbank
    (libaudio.py:848-874): per-frame quadratic interp from band centres to
    linear bins is a fixed linear map."""
    v_bins_warp = mel_curve_np(alpha, nbins)
    v_cntrs_mel = np.linspace(0, v_bins_warp[-1], nbands)
    f_interp = interpolate.interp1d(v_bins_warp, np.arange(nbins),
                                    kind=kind)
    v_cntrs = np.round(f_interp(v_cntrs_mel)).astype(int)
    M = np.zeros((nbands, nbins))
    for b in range(nbands):
        e = np.zeros(nbands)
        e[b] = 1.0
        f = interpolate.interp1d(v_cntrs, e, kind=kind)
        M[b] = f(np.arange(nbins))
    return M


def apply_fbank(m_mag: jnp.ndarray, alpha: float, nbands: int) -> jnp.ndarray:
    nbins = m_mag.shape[1]
    B = jnp.asarray(_fbank_matrix_np(alpha, nbins, nbands), m_mag.dtype)
    return mm(m_mag, B)


def sp_mel_warp_fbank(m_mag: jnp.ndarray, n_melbands: int,
                      alpha: float = 0.77) -> jnp.ndarray:
    """libaudio.py:763-769: exp(fbank(log|X|))."""
    return jnp.exp(apply_fbank(protected_log(m_mag), alpha, n_melbands))


def _td_spans_2d(n_melbands: int, max_span: int = 5) -> np.ndarray:
    """Per-band temporal smoothing spans (libaudio.py:798-801): the warp
    curve at alpha=-0.3 scaled to [1, max_span], forced odd via
    2*ceil(v/2)-1."""
    v = 1.0 + mel_curve_np(-0.3, n_melbands, amp=float(max_span - 1.0))
    return (2 * np.ceil(v / 2.0) - 1).astype(int)


def sp_mel_warp_fbank_2d(m_mag: jnp.ndarray, n_melbands: int,
                         alpha: float = 0.77,
                         max_span: int = 5) -> jnp.ndarray:
    """libaudio.py:771-813: fbank warp + band-dependent temporal smoothing.

    Each mel band's log trajectory is smoothed along the frame axis with
    hanning(span+2), span growing with band index (an inverted warp
    curve) — higher bands get longer temporal averaging.  Bands sharing a
    span are smoothed in one batched convolution (<=3 distinct spans for
    the default max_span=5 instead of a per-band loop)."""
    from .misc_dsp import smooth_by_conv

    m_log = apply_fbank(protected_log(m_mag), alpha, n_melbands)
    spans = _td_spans_2d(n_melbands, max_span)
    out = m_log
    for span in np.unique(spans):
        sel = np.where(spans == span)[0]
        sm = smooth_by_conv(m_log[:, sel], np.hanning(int(span) + 2))
        out = out.at[:, sel].set(sm)
    return jnp.exp(out)


def unwarp_from_fbank(m_mag_mel: jnp.ndarray, alpha: float, nbins: int,
                      interp_kind: str = "quadratic") -> jnp.ndarray:
    """libaudio.py:848-874 as a matmul."""
    nbands = m_mag_mel.shape[1]
    M = jnp.asarray(_unwarp_interp_matrix_np(alpha, nbins, nbands,
                                             interp_kind), m_mag_mel.dtype)
    return mm(m_mag_mel, M)


def sp_mel_unwarp_fbank(m_mag_mel: jnp.ndarray, nbins: int,
                        alpha: float = 0.77) -> jnp.ndarray:
    """libaudio.py:815-845."""
    return unwarp_from_fbank(m_mag_mel, alpha, nbins)


@functools.lru_cache(maxsize=16)
def _unwarp_curve_matrix_np(alpha: float, nbins_total: int, max_bin: int,
                            nbands: int, kind: str = "quadratic") -> np.ndarray:
    """Interp matrix for a TRUNCATED warp curve
    (phase_uncompress_fbank, magphase.py:798-808: the curve is
    build_mel_curve(alpha, fft_len_half)[:max_bin])."""
    v_bins_warp = mel_curve_np(alpha, nbins_total)[:max_bin]
    v_cntrs_mel = np.linspace(0, v_bins_warp[-1], nbands)
    f_interp = interpolate.interp1d(v_bins_warp, np.arange(max_bin),
                                    kind=kind)
    v_cntrs = np.round(f_interp(v_cntrs_mel)).astype(int)
    M = np.zeros((nbands, max_bin))
    for b in range(nbands):
        e = np.zeros(nbands)
        e[b] = 1.0
        f = interpolate.interp1d(v_cntrs, e, kind=kind)
        M[b] = f(np.arange(max_bin))
    return M


def unwarp_from_fbank_curve(m_mel: jnp.ndarray, alpha: float,
                            nbins_total: int, max_bin: int,
                            kind: str = "quadratic") -> jnp.ndarray:
    nbands = m_mel.shape[1]
    M = jnp.asarray(_unwarp_curve_matrix_np(alpha, nbins_total, max_bin,
                                            nbands, kind), m_mel.dtype)
    return mm(m_mel, M)


@functools.lru_cache(maxsize=16)
def _fbank_curve_matrix_np(alpha: float, nbins_total: int, max_bin: int,
                           nbands: int) -> np.ndarray:
    """Filter bank over a TRUNCATED warp curve: the phase-compression path
    passes v_bins_mel = build_mel_curve(alpha, fft_len_half)[:bin_cf] into
    apply_fbank (format_for_modelling_phase_comp, magphase.py:2588-2593)."""
    v_bins_warp = mel_curve_np(alpha, nbins_total)[:max_bin]
    v_cntrs_mel = np.linspace(0, v_bins_warp[-1], nbands)
    f_interp = interpolate.interp1d(v_bins_warp, np.arange(max_bin),
                                    kind="quadratic")
    v_cntrs = np.round(f_interp(v_cntrs_mel)).astype(int)

    m_fbank = np.zeros((max_bin, nbands))
    v_ext = np.r_[v_cntrs[0], v_cntrs, v_cntrs[-1]]
    for nxb in range(1, nbands + 1):
        wl = v_ext[nxb] - v_ext[nxb - 1]
        wr = v_ext[nxb + 1] - v_ext[nxb]
        v_win = gen_non_symmetric_win_np(wl, wr, np.hanning, b_norm=True)
        m_fbank[v_ext[nxb - 1]:v_ext[nxb - 1] + len(v_win), nxb - 1] = v_win
    return m_fbank


def apply_fbank_curve(m_data: jnp.ndarray, alpha: float, nbins_total: int,
                      max_bin: int, nbands: int) -> jnp.ndarray:
    """apply_fbank ('average' mode) over the first ``max_bin`` bins of the
    full warp curve; input columns beyond max_bin are ignored."""
    B = jnp.asarray(_fbank_curve_matrix_np(alpha, nbins_total, max_bin,
                                           nbands), m_data.dtype)
    return mm(m_data[:, :max_bin], B)
