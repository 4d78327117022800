"""Variable (pitch-synchronous) <-> constant frame-rate conversion.

Reference: interp_from_variable_to_const_frm_rate (magphase.py:2219-2239),
interp_from_const_to_variable_rate (magphase.py:2242-2252),
get_shifts_and_frm_locs_from_const_shifts (magphase.py:1426-1449, the
inherently sequential backward walk), shift_to_f0/f0_to_shift
(magphase.py:2198-2215).

The walk runs host-side in float64 (it is O(n_frames) scalar work and its
integer truncation must match the reference bit-for-bit); the dense feature
interpolation runs on device.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.interp import interp_linear_axis0
from ..core.spectral import MAGIC


def shift_to_f0_np(v_shift, v_voi, fs: int, out: str = "f0",
                   b_smooth: bool = True) -> np.ndarray:
    """magphase.py:2198-2207 (host, float64; medfilt kernel 3)."""
    from scipy import signal
    v_f0 = np.asarray(v_voi, np.float64) * fs / np.asarray(v_shift, np.float64)
    if b_smooth:
        v_f0 = v_voi * signal.medfilt(v_f0)
    if out == "lf0":
        with np.errstate(divide="ignore"):
            v_lf0 = np.log(v_f0)
        v_lf0[np.isinf(v_lf0)] = MAGIC
        return v_lf0
    return v_f0


def f0_to_shift_np(v_f0_in, fs: int, unv_frm_rate_ms: float = 5.0) -> np.ndarray:
    v_f0 = np.asarray(v_f0_in, np.float64).copy()
    v_f0[v_f0 == 0] = 1000.0 / unv_frm_rate_ms
    return fs / v_f0


def interp_from_variable_to_const_frm_rate(m_data, v_pm_smpls,
                                           const_rate_ms: float, fs: int):
    """Variable -> constant 5 ms grid (magphase.py:2219-2239), on device.

    Grid points: const_rate_smpls * [1, 2, ...] < v_pm_smpls[-1].  If the
    first pitch mark is after t=0, row 0 is duplicated as the t=0 anchor.
    """
    v_pm = np.asarray(v_pm_smpls, np.float64)
    const_rate_smpls = fs * const_rate_ms / 1000.0
    v_grid = np.arange(const_rate_smpls, v_pm[-1], const_rate_smpls)

    m_data = jnp.asarray(m_data)
    squeeze = m_data.ndim == 1
    if squeeze:
        m_data = m_data[:, None]
    if v_pm[0] > 0:
        x = np.r_[0.0, v_pm]
        m_src = jnp.concatenate([m_data[:1], m_data], axis=0)
    else:
        x = v_pm
        m_src = m_data
    out = interp_linear_axis0(jnp.asarray(x, m_src.dtype), m_src,
                              jnp.asarray(v_grid, m_src.dtype))
    return out[:, 0] if squeeze else out


def interp_from_const_to_variable_rate(m_data, v_frm_locs_smpls,
                                       frm_rate_ms: float, fs: int):
    """Constant grid -> variable frame locations (magphase.py:2242-2252)."""
    m_data = jnp.asarray(m_data)
    squeeze = m_data.ndim == 1
    if squeeze:
        m_data = m_data[:, None]
    n = m_data.shape[0]
    frm_rate_smpls = fs * frm_rate_ms / 1000.0
    x = frm_rate_smpls * np.arange(1, n + 1)
    out = interp_linear_axis0(jnp.asarray(x, m_data.dtype), m_data,
                              jnp.asarray(v_frm_locs_smpls, m_data.dtype))
    return out[:, 0] if squeeze else out


def get_shifts_and_frm_locs_from_const_shifts(v_shift_c_rate: np.ndarray,
                                              frm_rate_ms: float, fs: int):
    """Backward walk recovering variable-rate frame locations from a
    constant-rate shift track (magphase.py:1426-1449).  Host-side float64;
    sequential by construction (each step depends on the interpolated shift
    at the previous location)."""
    v_shift_c_rate = np.asarray(v_shift_c_rate, np.float64)
    n = v_shift_c_rate.shape[0]
    frm_rate_smpls = fs * frm_rate_ms / 1000.0
    v_centres = frm_rate_smpls * np.arange(1, n + 1)

    locs = []
    shifts = []
    curr = v_centres[-1]
    for _ in range(2 * n - 1):
        if curr < v_centres[0]:   # out of interpolation range -> stop
            break
        locs.append(curr)
        s = np.interp(curr, v_centres, v_shift_c_rate)
        shifts.append(s)
        curr = curr - s
    locs.reverse()
    shifts.reverse()
    return np.asarray(shifts), np.asarray(locs)


def to_constant_rate(m_data, targ_shift_ms: float, v_shift, fs: int):
    """Older cumsum-based resampler (magphase.py:2032-2044)."""
    v_in_cntr = np.cumsum(np.asarray(v_shift, np.float64))
    in_len = v_in_cntr[-1] + v_shift[-1]
    targ = targ_shift_ms / 1000.0 * fs
    v_targ = np.arange(targ, in_len, targ).astype(int)
    m_data = jnp.asarray(m_data)
    return interp_linear_axis0(jnp.asarray(v_in_cntr, m_data.dtype), m_data,
                               jnp.asarray(v_targ, m_data.dtype))
