"""Objective eval metric (mel-spectral distortion)."""
import numpy as np

from magphase_tpu.utils.eval import (log_mel_spectrogram,
                                     log_spectral_distortion_feats,
                                     mel_spectral_distortion)


def test_msd_identity_is_zero():
    rng = np.random.RandomState(0)
    sig = rng.randn(48000).astype(np.float64) * 0.1
    assert mel_spectral_distortion(sig, sig, 48000) == 0.0


def test_msd_detects_spectral_change():
    rng = np.random.RandomState(0)
    sig = rng.randn(48000) * 0.1
    # low-passed copy must measure a clearly nonzero distortion
    k = np.ones(8) / 8.0
    lp = np.convolve(sig, k, mode="same")
    d = mel_spectral_distortion(sig, lp, 48000)
    assert d > 1.0


def test_logmel_shape_and_feat_msd():
    sig = np.sin(np.arange(24000) * 0.03)
    m = log_mel_spectrogram(sig, 48000, n_mel=40)
    assert m.shape[1] == 40
    assert m.shape[0] > 50
    assert log_spectral_distortion_feats(m, m) == 0.0
    assert log_spectral_distortion_feats(m, m + 0.1) > 0.0


def test_msd_alignment_removes_time_shift():
    rng = np.random.RandomState(0)
    sig = rng.randn(48000) * 0.1
    shifted = np.concatenate([np.zeros(600), sig])[:48000]
    d_noalign = mel_spectral_distortion(sig, shifted, 48000, align=False)
    d_align = mel_spectral_distortion(sig, shifted, 48000, align=True)
    assert d_align < 0.05 * d_noalign
    assert d_align < 1.0


def test_msd_exclude_gain_ignores_level():
    rng = np.random.RandomState(0)
    sig = rng.randn(48000) * 0.1
    d = mel_spectral_distortion(sig, sig * 0.7, 48000, exclude_gain=True)
    assert d < 1e-4
