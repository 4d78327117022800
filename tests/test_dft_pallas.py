"""Fused Pallas DFT kernels (experimental, tools/dft_pallas.py).

Not wired into production (measured slower than core/matfft.py's einsum
formulation on v5e — see the module docstring) but kept correct: these
tests pin the math via interpret mode so the reference implementation
stays usable for future toolchains.
"""
import numpy as np
import jax.numpy as jnp

import importlib.util as _ilu
import pathlib

_spec = _ilu.spec_from_file_location(
    "dft_pallas", pathlib.Path(__file__).resolve().parents[1] / "tools" / "dft_pallas.py")
DP = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(DP)


def test_rfft_fused_matches_numpy():
    rng = np.random.RandomState(0)
    for n in (2048, 4096):
        x = rng.randn(6, n).astype(np.float32)
        re, im = DP.rfft_fused(jnp.asarray(x), n)
        ref = np.fft.rfft(x)
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(np.asarray(re) - ref.real)) / scale < 1e-5
        assert np.max(np.abs(np.asarray(im) - ref.imag)) / scale < 1e-5


def test_irfft_fused_matches_numpy():
    rng = np.random.RandomState(1)
    for n in (2048, 4096):
        h = n // 2 + 1
        zr = rng.randn(6, h).astype(np.float32)
        zi = rng.randn(6, h).astype(np.float32)
        y = DP.irfft_fused(jnp.asarray(zr), jnp.asarray(zi), n)
        ref = np.fft.irfft(zr + 1j * zi, n=n)
        assert np.max(np.abs(np.asarray(y) - ref)) < 1e-6


def test_fused_roundtrip_and_lead_dims():
    rng = np.random.RandomState(2)
    n = 2048
    x = rng.randn(2, 3, n).astype(np.float32)
    re, im = DP.rfft_fused(jnp.asarray(x), n)
    assert re.shape == (2, 3, n // 2 + 1)
    y = DP.irfft_fused(re, im, n)
    assert y.shape == x.shape
    assert np.max(np.abs(np.asarray(y) - x)) < 1e-4
