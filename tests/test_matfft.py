"""Matmul-DFT kernels (core/matfft.py) vs jnp.fft oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from magphase_tpu.core import matfft


@pytest.mark.parametrize("n", [256, 1024, 2048, 4096])
def test_rfft_matches_native(n, monkeypatch):
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    rng = np.random.RandomState(0)
    x = rng.randn(6, n).astype(np.float32)
    got = np.asarray(matfft.rfft(jnp.asarray(x)))
    ref = np.fft.rfft(x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6


@pytest.mark.parametrize("n", [256, 2048, 4096])
def test_irfft_matches_native(n, monkeypatch):
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    rng = np.random.RandomState(1)
    X = (rng.randn(5, n // 2 + 1) +
         1j * rng.randn(5, n // 2 + 1)).astype(np.complex64)
    got = np.asarray(matfft.irfft(jnp.asarray(X), n=n))
    ref = np.fft.irfft(X.astype(np.complex128), n=n)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6


def test_rfft_zero_pad_and_roundtrip(monkeypatch):
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    rng = np.random.RandomState(2)
    x = rng.randn(3, 1500).astype(np.float32)
    got = np.asarray(matfft.rfft(jnp.asarray(x), n=2048))
    ref = np.fft.rfft(x.astype(np.float64), n=2048)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
    # round trip
    back = np.asarray(matfft.irfft(jnp.asarray(got), n=2048))
    assert np.abs(back[:, :1500] - x).max() < 1e-5


def test_non_pow2_falls_back(monkeypatch):
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    x = np.random.RandomState(3).randn(2, 1000).astype(np.float32)
    got = np.asarray(matfft.rfft(jnp.asarray(x), n=1000))
    ref = np.fft.rfft(x.astype(np.float64), n=1000)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


@pytest.mark.parametrize("n", [1024, 2048])
def test_rfft_noise_grade(n, monkeypatch):
    """Single-matmul bf16 forward DFT: noise-grade accuracy (~4e-3 rel)
    and exact-native fallback off the matmul path."""
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    rng = np.random.RandomState(5)
    x = rng.uniform(-1, 1, (4, n)).astype(np.float32)
    got = np.asarray(matfft.rfft_noise_grade(jnp.asarray(x)))
    ref = np.fft.rfft(x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-2
    # spectrum stays white: per-bin mean power within 20% of n/3
    # (uniform[-1,1) variance) over the 4-row average
    monkeypatch.setenv("MAGPHASE_NOISE_RFFT", "f32")
    exact = np.asarray(matfft.rfft_noise_grade(jnp.asarray(x)))
    assert np.abs(exact - ref).max() / scale < 2e-6


@pytest.mark.parametrize("n", [1024, 2048, 4096])
def test_irfft_direct(n, monkeypatch):
    """Single-matmul irfft: ~f32 accuracy at precision='high' (the f32
    accumulation dominates the error, not the 3-pass operand split)."""
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    rng = np.random.RandomState(6)
    h = n // 2 + 1
    X = (rng.randn(4, h) + 1j * rng.randn(4, h)).astype(np.complex64)
    ref = np.fft.irfft(X.astype(np.complex128), n=n)
    scale = np.abs(ref).max()
    for prec in ("high", "highest"):
        got = np.asarray(matfft.irfft_direct(jnp.asarray(X), n=n,
                                             precision=prec))
        assert got.dtype == np.float32
        assert np.abs(got - ref).max() / scale < 2e-6, prec


@pytest.mark.parametrize("n", [1024, 2048, 4096])
def test_rfft_direct(n, monkeypatch):
    """Single-matmul forward DFT at 'high'/'highest' precision — the
    production default for compressed analysis (rfft_mode='direct_high',
    parallel/analysis_batch.py:_compressed_rfft_mode); ~f32 accuracy."""
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    rng = np.random.RandomState(7)
    x = rng.randn(4, n).astype(np.float32)
    ref = np.fft.rfft(x.astype(np.float64))
    scale = np.abs(ref).max()
    for prec in ("high", "highest"):
        got = np.asarray(matfft.rfft_direct(jnp.asarray(x), precision=prec))
        assert got.dtype == np.complex64
        assert np.abs(got - ref).max() / scale < 1e-5, prec
    # pad/truncate semantics match jnp.fft.rfft
    got_p = np.asarray(matfft.rfft_direct(jnp.asarray(x[:, :n - 100]), n=n))
    ref_p = np.fft.rfft(x[:, :n - 100].astype(np.float64), n=n)
    assert np.abs(got_p - ref_p).max() / np.abs(ref_p).max() < 1e-5
    # float64 input falls back to the exact native path (needs x64 on —
    # with it off jnp silently downcasts and the guard is unreachable)
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        x64 = jnp.asarray(x.astype(np.float64))
        assert x64.dtype == jnp.float64
        got64 = np.asarray(matfft.rfft_direct(x64))
    finally:
        jax.config.update("jax_enable_x64", False)
    assert np.abs(got64 - ref).max() / scale < 1e-9


def test_rfft_noise_grade_float64_fallback(monkeypatch):
    """float64 input must take the exact native path, not be crushed to
    bfloat16 (ADVICE r3)."""
    import jax
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    x = np.random.RandomState(8).randn(2, 1024)
    ref = np.fft.rfft(x)
    jax.config.update("jax_enable_x64", True)
    try:
        got = np.asarray(matfft.rfft_noise_grade(jnp.asarray(x)))
    finally:
        jax.config.update("jax_enable_x64", False)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-9


def test_disabled_matches_exactly(monkeypatch):
    monkeypatch.setenv("MAGPHASE_MATFFT", "0")
    x = np.random.RandomState(4).randn(2, 512).astype(np.float32)
    got = np.asarray(matfft.rfft(jnp.asarray(x)))
    ref = np.asarray(jnp.fft.rfft(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_rfft_truncation_and_small_n(monkeypatch):
    """jnp.fft.rfft semantics at the edges of the matmul path: n smaller
    than the input truncates; tiny power-of-two n works (review findings)."""
    monkeypatch.setenv("MAGPHASE_MATFFT", "1")
    rng = np.random.RandomState(4)
    x = rng.randn(3, 4096).astype(np.float32)
    got = np.asarray(matfft.rfft(jnp.asarray(x), n=2048))
    ref = np.fft.rfft(x, n=2048)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5

    for n in (2, 4, 256):
        z = (rng.randn(3, n // 2 + 1) + 1j * rng.randn(3, n // 2 + 1))
        z = z.astype(np.complex64)
        y = np.asarray(matfft.irfft(jnp.asarray(z), n=n))
        np.testing.assert_allclose(y, np.fft.irfft(z, n=n), atol=1e-5)
