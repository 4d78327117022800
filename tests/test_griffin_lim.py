"""Pitch-synchronous Griffin-Lim (magphase.py:3320-3373) and the
per_phase_type synthesis variants."""
import os

import jax
import numpy as np
import pytest

from magphase_tpu.io import read_binfile

PRED = "/root/reference/demos/data_48k/params_predicted"


@pytest.fixture(scope="module")
def mag_and_shifts(demo_wav, synthetic_pm):
    from magphase_tpu.vocoder import analysis_with_del_comp_from_pm
    sig, fs = demo_wav
    pm, shifts = synthetic_pm
    pm, shifts = pm[:80], shifts[:80]
    mag, *_ = analysis_with_del_comp_from_pm(sig, fs, pm, np.ones(len(pm)),
                                             fft_len=1024)
    return mag, shifts


def _recon_err(m_mag, v_shift, v_sig):
    """Magnitude-consistency error: |STFT-mag(sig) - target|."""
    from magphase_tpu.vocoder import analysis_with_del_comp_from_pm
    pm = np.cumsum(v_shift)
    mag, *_ = analysis_with_del_comp_from_pm(
        v_sig, 48000, pm, np.ones(len(pm)), fft_len=1024)
    n = min(len(mag), len(m_mag))
    return float(np.mean(np.abs(mag[:n] - m_mag[:n])))


@pytest.mark.parametrize("init", ["random", "linear", "min_phase"])
def test_griffin_lim_converges(mag_and_shifts, init):
    from magphase_tpu.vocoder import griffin_lim
    m_mag, shifts = mag_and_shifts
    v1, _ = griffin_lim(m_mag, shifts, phase_init=init, niters=1,
                        key=jax.random.PRNGKey(0))
    v8, ph = griffin_lim(m_mag, shifts, phase_init=init, niters=8,
                         key=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(v8))
    assert ph.shape == (len(m_mag), m_mag.shape[1])
    # more iterations must not worsen magnitude consistency
    e1 = _recon_err(m_mag, shifts, v1)
    e8 = _recon_err(m_mag, shifts, v8)
    assert e8 <= e1 * 1.05


@pytest.mark.parametrize("ptype", ["linear", "min_phase"])
def test_synthesis_per_phase_variants(ptype):
    from magphase_tpu.vocoder import synthesis_from_compressed
    mag = read_binfile(os.path.join(PRED, "hvd_704.mag"), 60)[:64]
    real = read_binfile(os.path.join(PRED, "hvd_704.real"), 45)[:64]
    imag = read_binfile(os.path.join(PRED, "hvd_704.imag"), 45)[:64]
    lf0 = read_binfile(os.path.join(PRED, "hvd_704.lf0"), 1)[:64]
    v = synthesis_from_compressed(mag, real, imag, lf0, 48000,
                                  per_phase_type=ptype,
                                  key=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(v))
    assert np.std(v) > 1e-4
