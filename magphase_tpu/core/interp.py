"""Interpolation primitives (JAX).

The reference leans on scipy.interpolate.interp1d for frame-rate conversion
(linear, axis=0) and phase-coefficient extension (nearest with edge
extrapolation).  These are the dense equivalents.
"""
from __future__ import annotations

import jax.numpy as jnp


def interp_linear_axis0(x_grid: jnp.ndarray, m_data: jnp.ndarray,
                        x_new: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of (N, D) rows sampled at x_grid onto x_new.

    Out-of-range queries clamp to the edge rows (callers guarantee in-range
    queries where the reference would raise).
    x_grid must be strictly increasing.
    """
    n = x_grid.shape[0]
    hi = jnp.clip(jnp.searchsorted(x_grid, x_new, side="left"), 1, n - 1)
    lo = hi - 1
    x_lo = jnp.take(x_grid, lo)
    x_hi = jnp.take(x_grid, hi)
    w = (x_new - x_lo) / jnp.maximum(x_hi - x_lo, 1e-12)
    w = jnp.clip(w, 0.0, 1.0)
    d_lo = jnp.take(m_data, lo, axis=0)
    d_hi = jnp.take(m_data, hi, axis=0)
    if m_data.ndim == 2:
        w = w[:, None]
    return d_lo + w * (d_hi - d_lo)


def extend_nearest_coeffs(m_data: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Nearest-neighbour extension of coefficient columns 0..n_in-1 to n_out
    columns, replicating interp1d(kind='nearest', fill_value='extrapolate')
    queried at integer positions (magphase.py:1225-1229): columns beyond the
    input range repeat the last input column."""
    n_in = m_data.shape[1]
    idx = jnp.clip(jnp.arange(n_out), 0, n_in - 1)
    return jnp.take(m_data, idx, axis=1)
