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


def truncate_shifts(v_shift: np.ndarray) -> np.ndarray:
    """Float shifts -> integer samples with the reference's truncation
    semantics (``v_shift.astype(int)``, magphase.py:879) made stable
    against float round-trip noise.

    The analysis side derives f0 = fs/shift from INTEGER shifts; synthesis
    inverts it as int(fs/exp(log(f0))).  exp/log round-trip error (1 ulp
    in f64; ~3e-7 relative once lf0 passes through a float32 feature
    file, the reference's own on-disk format) lands fs/f0 a hair BELOW
    the integer, and bare truncation then yields shift-1 on a coin flip
    per frame.  The resulting pitch-mark drift time-warps the output
    (measured: 16 kHz corpus MSD 15.3 dB vs 6.1 with exact shifts on
    hvd_591).  A relative guard of 1e-5 — far above the float noise, far
    below any genuinely intended fractional shift — restores exactness;
    values not within 1e-5 of an integer truncate exactly as the
    reference does."""
    v = np.asarray(v_shift, np.float64)
    return np.floor(v * (1.0 + 1e-5)).astype(np.int64)


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


def const_rate_resample_core(m_feats, f0, pm, n_frames, *,
                             const_rate_smpls: float, fc_max: int):
    """Variable -> constant rate for ONE padded utterance, on device.

    The batched/fused form of analysis_compressed's const-rate block
    (magphase.py:2967-2980): features are linearly interpolated onto the
    5 ms grid (t=0 anchored with a duplicated first row), and f0 uses the
    voiced-only interpolation trick — interpolate f0 over voiced frames
    only, gate by interpolated voicing > 0.5.

    m_feats: tuple of (F, D) arrays; f0 (F,); pm (F,) int samples;
    n_frames: valid frame count.  Returns (outs, f0_const, n_const) where
    rows past n_const are padding.
    """
    F = pm.shape[0]
    valid = jnp.arange(F) < n_frames
    pm_f = pm.astype(jnp.float32)
    last_pm = pm_f[jnp.maximum(n_frames - 1, 0)]
    BIG = jnp.float32(1e18)   # padding x: clamp weight underflows in f32

    x = jnp.concatenate([jnp.zeros(1, jnp.float32),
                         jnp.where(valid, pm_f, BIG)])
    grid = (jnp.arange(fc_max, dtype=jnp.float32) + 1.0) * const_rate_smpls
    n_const = jnp.sum(grid < last_pm).astype(jnp.int32)

    outs = tuple(
        interp_linear_axis0(x, jnp.concatenate([m[:1], m], axis=0), grid)
        for m in m_feats)

    # voiced-only f0 (magphase.py:2976-2980): sort voiced pms to the front,
    # clamp the padding tail to the last voiced value so interpolation
    # between the last voiced mark and the grid end stays constant
    voi_b = valid & (f0 > 1.0)
    xv = jnp.where(voi_b, pm_f, BIG)
    order = jnp.argsort(xv)
    xv_s = jnp.take(xv, order)
    fv_s = jnp.take(f0, order)
    nv = jnp.sum(voi_b)
    last_f0 = fv_s[jnp.maximum(nv - 1, 0)]
    fv_s = jnp.where(jnp.arange(F) < nv, fv_s, last_f0)
    f0_i = interp_linear_axis0(
        jnp.concatenate([jnp.zeros(1, jnp.float32), xv_s]),
        jnp.concatenate([fv_s[:1], fv_s]), grid)
    voi_i = interp_linear_axis0(
        x, jnp.concatenate([voi_b[:1], voi_b]).astype(jnp.float32), grid)
    # zero everything past n_const: the clamped interpolation otherwise
    # leaks the last voiced f0 into padding, and the downstream medfilt's
    # final window would see it instead of the zero the host oracle
    # (scipy zero-padding) sees
    in_range = jnp.arange(fc_max) < n_const
    f0_const = jnp.where(in_range & (nv > 0) & (voi_i > 0.5), f0_i, 0.0)
    outs = tuple(jnp.where(in_range[:, None], o, 0.0) for o in outs)
    return outs, f0_const, n_const


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
