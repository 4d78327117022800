"""Spectral-domain primitives (JAX, batched over frames).

Ports of the live libaudio.py spectral utilities, re-expressed for dense
(frames, bins) tensors and rfft/irfft half-spectra.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

MAGIC = -1.0e10  # SPTK log floor (libaudio.py:17)


def protected_log(m_x: jnp.ndarray) -> jnp.ndarray:
    """Protected log: inf/nan -> MAGIC (libaudio.py:241-248)."""
    m_y = jnp.log(m_x)
    return jnp.where(jnp.isfinite(m_y), m_y, MAGIC)


def protected_log_np(m_x: np.ndarray) -> np.ndarray:
    """Host-side protected log (libaudio.py:241-248)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        m_y = np.log(m_x)
    m_y[~np.isfinite(m_y)] = MAGIC
    return m_y


def f0_to_lf0(v_f0: jnp.ndarray) -> jnp.ndarray:
    """log with MAGIC floor at f0==0 (libaudio.py:458-465)."""
    v_lf0 = jnp.log(jnp.maximum(v_f0, 1e-300))
    return jnp.where(v_f0 > 0, v_lf0, MAGIC)


def db(m_data: jnp.ndarray, b_inv: bool = False) -> jnp.ndarray:
    """20*log10 and inverse (libaudio.py:635-639)."""
    if not b_inv:
        return 20.0 * jnp.log10(m_data)
    return 10.0 ** (m_data / 20.0)


def add_hermitian_half(m_data: jnp.ndarray, data_type: str = "mag") -> jnp.ndarray:
    """Mirror the non-redundant half spectrum (libaudio.py:369-388)."""
    if data_type in ("mag", "magnitude"):
        return jnp.concatenate(
            [m_data, m_data[:, -2:0:-1]], axis=1)
    if data_type == "phase":
        m = m_data.at[:, 0].set(0).at[:, -1].set(0)
        return jnp.concatenate([m, -m[:, -2:0:-1]], axis=1)
    if data_type == "zeros":
        nfrms, h = m_data.shape
        return jnp.concatenate([m_data, jnp.zeros((nfrms, h - 2),
                                                  m_data.dtype)], axis=1)
    if data_type == "complex":
        re = add_hermitian_half(m_data.real)
        im = add_hermitian_half(m_data.imag, data_type="phase")
        return re + 1j * im
    raise ValueError(data_type)


def remove_hermitian_half(m_data: jnp.ndarray) -> jnp.ndarray:
    """Keep floor(N/2)+1 bins (libaudio.py:392-399)."""
    n_half = m_data.shape[1] // 2 + 1
    return m_data[:, :n_half]


@functools.lru_cache(maxsize=64)
def mel_curve_np(alpha: float, nbins: int, amp: float = float(np.pi)) -> np.ndarray:
    """The alpha-warp frequency curve (libaudio.py:711-718), host-side.

    beta(omega) = arctan((1-a^2) sin w / ((1+a^2) cos w - 2a)), lifted into
    [0, pi] and scaled to ``amp``.
    """
    v_bins = np.linspace(0, np.pi, nbins)
    v_warp = np.arctan((1 - alpha ** 2) * np.sin(v_bins)
                       / ((1 + alpha ** 2) * np.cos(v_bins) - 2 * alpha))
    v_warp[v_warp < 0] += np.pi
    return v_warp * (amp / np.pi)


def build_mel_curve(alpha: float, nbins: int, amp: float = float(np.pi)) -> jnp.ndarray:
    return jnp.asarray(mel_curve_np(alpha, nbins, amp), dtype=jnp.float32)


@functools.lru_cache(maxsize=64)
def crossfade_down_win_np(cut_off: float, bw: float, fs: int,
                          fft_len_half: int) -> np.ndarray:
    """Left (fade-out) window of spectral_crossfade (libaudio.py:160-186):
    ones up to cut_off-bw/2, hanning half-fade to zero at cut_off+bw/2.

    spectral_crossfade(A, B) == A*win_l + B*(1-win_l) exactly, because the
    hanning up/down half windows are complementary:
    hanning(2n+1)[n:] + hanning(2n+1)[:n+1] reversed == 1.
    """
    fft_len = (fft_len_half - 1) * 2
    bin_l = int(np.round((cut_off - bw / 2.0) * fft_len / float(fs)))
    bin_r = int(np.round((cut_off + bw / 2.0) * fft_len / float(fs)))
    bw_bin = bin_r - bin_l
    v_win = np.hanning(2 * bw_bin + 1)
    fade = v_win[bw_bin:]                      # 1 -> 0 over bw_bin+1 points
    out = np.concatenate([np.ones(bin_l), fade,
                          np.zeros(fft_len_half - bin_r - 1)])
    return out


def spectral_crossfade(m_sp_l, m_sp_r, cut_off: float, bw: float, fs: int):
    """Crossfade two half spectra around cut_off (libaudio.py:160-186)."""
    h = m_sp_l.shape[1]
    w = jnp.asarray(crossfade_down_win_np(cut_off, bw, fs, h),
                    dtype=jnp.result_type(m_sp_l.real))
    return m_sp_l * w[None, :] + m_sp_r * (1.0 - w)[None, :]


def rceps(m_data: jnp.ndarray, in_type: str = "log",
          out_type: str = "compact") -> jnp.ndarray:
    """Real cepstrum of a half spectrum (libaudio.py:252-269).

    'compact' doubles coefficients 1..ncoeffs-3 and truncates to ncoeffs —
    note the reference's exact (off-by-one-looking) doubling range is
    reproduced deliberately: m_rceps[:, 1:(ncoeffs-2)] *= 2.
    """
    ncoeffs = m_data.shape[1]
    if in_type == "abs":
        m_data = protected_log(m_data)
    m_full = add_hermitian_half(m_data, data_type="magnitude")
    m_rceps = jnp.fft.ifft(m_full).real
    if out_type == "compact":
        scale = jnp.ones(m_rceps.shape[1])
        scale = scale.at[1:ncoeffs - 2].set(2.0)
        m_rceps = (m_rceps * scale)[:, :ncoeffs]
    return m_rceps


def build_min_phase_from_mag_spec(m_mag: jnp.ndarray) -> jnp.ndarray:
    """Minimum-phase complex spectrum via cepstral folding
    (libaudio.py:920-934)."""
    h = m_mag.shape[1]
    m_log = protected_log(m_mag)
    m_full = add_hermitian_half(m_log)
    m_ceps = jnp.fft.ifft(m_full).real
    n = m_full.shape[1]
    scale = jnp.zeros(n).at[0].set(1.0).at[h - 1].set(1.0)
    scale = scale.at[1:h - 1].set(2.0)
    m_ceps = m_ceps * scale                      # zero upper half, double mid
    m_cmplx = jnp.fft.fft(m_ceps)
    return jnp.exp(m_cmplx[:, :h])


def rceps_to_min_phase_rceps(m_rceps: jnp.ndarray) -> jnp.ndarray:
    """Cepstral folding (libaudio.py:190-197)."""
    h = m_rceps.shape[1] // 2 + 1
    scale = jnp.ones(m_rceps.shape[1]).at[1:h - 1].set(2.0)
    return (m_rceps * scale)[:, :h]


def spectral_smoothing_rceps(m_sp_log: jnp.ndarray, nc_total: int = 60,
                             fade_to_total: float = 0.2) -> jnp.ndarray:
    """Cepstral liftering smoother (libaudio.py:203-238)."""
    nc_fade = int(round(fade_to_total * nc_total))
    m_full = add_hermitian_half(m_sp_log)
    m_rceps = jnp.fft.ifft(m_full).real
    n = m_full.shape[1]
    h = n // 2 + 1
    fold = jnp.ones(n).at[1:h - 1].set(2.0)
    m_minph = (m_rceps * fold)[:, :h]
    v_win = np.hanning(2 * nc_fade + 3)[nc_fade + 2:-1]
    mask = np.ones(h)
    mask[nc_total:] = 0.0
    mask[nc_total - nc_fade:nc_total] = v_win
    m_minph = m_minph * jnp.asarray(mask)
    m_padded = jnp.concatenate(
        [m_minph, jnp.zeros((m_minph.shape[0], n - h), m_minph.dtype)], axis=1)
    m_sm = jnp.fft.fft(m_padded).real
    return m_sm[:, :m_sp_log.shape[1]]


def true_envelope(m_sp: jnp.ndarray, in_type: str = "abs", ncoeffs: int = 60,
                  thres_db: float = 0.1, n_maxiter: int = 100) -> jnp.ndarray:
    """Iterative true-envelope estimator (libaudio.py:295-340), vectorised
    over frames with a fixed iteration count (jit-friendly: the reference's
    per-frame early-exit becomes a per-frame freeze mask)."""
    if in_type == "db":
        m_db = m_sp
    elif in_type == "abs":
        m_db = db(m_sp)
    elif in_type == "log":
        m_db = (20.0 / np.log(10.0)) * m_sp
    else:
        raise ValueError(in_type)

    def body(carry, _):
        v_sp_db, done = carry
        v_sm = spectral_smoothing_rceps(v_sp_db, nc_total=ncoeffs,
                                        fade_to_total=0.7)
        err = jnp.mean(jnp.abs(v_sp_db - v_sm), axis=1, keepdims=True)
        newly_done = err < thres_db
        v_new = jnp.where(done | newly_done, v_sp_db,
                          jnp.maximum(v_sp_db, v_sm))
        return (v_new, done | newly_done), v_sm

    import jax
    (_, _), sms = jax.lax.scan(body, (m_db, jnp.zeros((m_db.shape[0], 1),
                                                      bool)), None,
                               length=n_maxiter)
    m_env_db = sms[-1]
    if in_type == "db":
        return m_env_db
    if in_type == "abs":
        return db(m_env_db, b_inv=True)
    return (np.log(10.0) / 20.0) * m_env_db


def get_rms(m_data: jnp.ndarray, nFFT: int) -> jnp.ndarray:
    """Spectral-domain RMS (libaudio.py:564-568)."""
    m2 = m_data ** 2
    h = nFFT // 2
    scale = jnp.ones(m_data.shape[1]).at[1:h].set(2.0)
    return jnp.sqrt(jnp.sum((m2 * scale)[:, :h + 1], axis=1) / nFFT)
