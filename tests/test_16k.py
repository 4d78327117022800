"""16 kHz end-to-end: alpha=0.58, fft_len=2048, crossfade cf=2.5 kHz
(define_alpha magphase.py:3279-3290, define_fft_len 3292-3299,
define_crossfade_params 3301-3317)."""
import numpy as np
import jax
import pytest
from scipy import signal as sp

from magphase_tpu.config import (MagPhaseConfig, define_alpha,
                                 define_fft_len, define_crossfade_params)


def test_16k_config_constants():
    cfg = MagPhaseConfig(fs=16000)
    assert cfg.alpha == 0.58
    assert cfg.fft_len == 2048
    assert define_crossfade_params(16000) == (2500.0, 2000.0)
    assert define_alpha(22050) == 0.65
    assert define_fft_len(8000) == 1024


@pytest.fixture(scope="module")
def wav16(demo_wav):
    sig, fs = demo_wav
    assert fs == 48000
    return sp.resample_poly(sig, 1, 3), 16000


def test_16k_compressed_roundtrip(tmp_path, wav16):
    from magphase_tpu.io import write_wav
    from magphase_tpu.vocoder import (analysis_compressed,
                                      synthesis_from_compressed)
    sig, fs = wav16
    wav_path = str(tmp_path / "u16.wav")
    write_wav(wav_path, 0.9 * sig / np.abs(sig).max(), fs)

    # synthetic epochs (skip the tracker; its quality is tested elsewhere)
    rng = np.random.RandomState(3)
    shifts = rng.choice([80, 100, 128, 160], size=100)
    pm = np.cumsum(shifts)
    voi = (rng.rand(100) > 0.3).astype(np.float64)

    mml, mrm, mim, lf0, shift, fs_out, fft_len = analysis_compressed(
        wav_path, mag_dim=40, phase_dim=20, pm_sec=pm / fs, voi=voi)
    assert fs_out == 16000
    assert fft_len == 2048
    assert mml.shape == (100, 40)
    assert np.all(np.isfinite(mml))

    v = synthesis_from_compressed(mml, mrm, mim, lf0, fs,
                                  key=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(v))
    assert np.std(v) > 1e-5


def test_22050_and_44100_round_trip_smoke():
    """The other two supported rates (alpha table, magphase.py:3279-3290)
    through batched analysis + synthesis."""
    import jax
    from magphase_tpu.parallel.analysis_batch import analysis_compressed_batch
    from magphase_tpu.parallel.batch import synthesis_from_compressed_batch

    for fs in (22050, 44100):
        t = np.arange(int(1.0 * fs)) / fs
        sig = 0.3 * np.sign(np.sin(2 * np.pi * 140 * t))
        feats = analysis_compressed_batch([sig], fs, mag_dim=40,
                                          phase_dim=20)
        mml, mrm, mim, lf0, sh = feats[0]
        assert (lf0 > -1e9).mean() > 0.8
        wavs = synthesis_from_compressed_batch(
            [(mml, mrm, mim, lf0)], fs, key=jax.random.PRNGKey(0))
        w = wavs[0]
        assert np.all(np.isfinite(w)) and np.std(w) > 1e-3
        assert abs(len(w) - len(sig)) < fs // 5
