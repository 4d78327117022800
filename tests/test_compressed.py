"""Compressed pipeline: synthesis from real predicted parameters, post
filters, frame-rate conversion."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magphase_tpu.io import read_binfile
from magphase_tpu.vocoder import (synthesis_from_compressed, post_filter,
                                  post_filter_merlin, framerate)

PRED_DIR = "/root/reference/demos/data_48k/params_predicted"


@pytest.fixture(scope="module")
def predicted_params():
    """hvd_704: Merlin-predicted 60/45/45/1-dim streams (204 frames)."""
    mag = read_binfile(os.path.join(PRED_DIR, "hvd_704.mag"), dim=60)
    real = read_binfile(os.path.join(PRED_DIR, "hvd_704.real"), dim=45)
    imag = read_binfile(os.path.join(PRED_DIR, "hvd_704.imag"), dim=45)
    lf0 = read_binfile(os.path.join(PRED_DIR, "hvd_704.lf0"), dim=1)
    return mag, real, imag, lf0


def test_synthesis_from_predicted_params(predicted_params):
    mag, real, imag, lf0 = predicted_params
    v_syn = synthesis_from_compressed(mag, real, imag, lf0, 48000,
                                      key=jax.random.PRNGKey(7))
    # expected length: sum of integer shifts + last shift + 1
    v_f0 = np.exp(lf0)
    v_shift = framerate.f0_to_shift_np(v_f0, 48000).astype(np.int64)
    v_pm = np.cumsum(v_shift)
    exp_len = v_pm[-1] + (v_pm[-1] - v_pm[-2]) + 1
    assert v_syn.shape[0] == exp_len
    assert np.all(np.isfinite(v_syn))
    # sane speech-like signal: nonzero, bounded
    assert 1e-4 < np.max(np.abs(v_syn)) < 1e3
    # voiced region should carry most energy
    assert np.std(v_syn) > 1e-4


def test_synthesis_deterministic_under_key(predicted_params):
    mag, real, imag, lf0 = predicted_params
    a = synthesis_from_compressed(mag, real, imag, lf0, 48000,
                                  key=jax.random.PRNGKey(1))
    b = synthesis_from_compressed(mag, real, imag, lf0, 48000,
                                  key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(a, b)
    c = synthesis_from_compressed(mag, real, imag, lf0, 48000,
                                  key=jax.random.PRNGKey(2))
    assert np.abs(a - c).max() > 0  # different noise draw


def test_post_filter_reference_oracle(predicted_params):
    """Vectorised post_filter vs a direct port of the reference loop
    (magphase.py:2343-2376)."""
    mag = predicted_params[0][:50]
    got = np.asarray(post_filter(jnp.asarray(mag), 48000))

    # oracle: direct loop
    nfrms, mag_dim = mag.shape
    az, an, bz, bn = 11, 3, 1.8, 2.0
    v_nx = np.arange(az // 2, mag_dim - an // 2)
    v_lens = np.linspace(az, an, v_nx.size)
    v_lens = (2 * np.ceil(v_lens / 2) - 1).astype(int)
    oracle = np.zeros_like(mag)
    for f in range(nfrms):
        v = mag[f]
        v_ave = np.zeros(mag_dim)
        for nxb in v_nx:
            half = v_lens[nxb - v_nx[0]] // 2
            v_ave[nxb] = np.mean(v[nxb - half:nxb + half + 1])
        v_ave[:v_nx[0]] = v_ave[v_nx[0]]
        v_ave[v_nx[-1]:] = v_ave[v_nx[-1]]
        tilt = np.linspace(bz, bn, mag_dim)
        enh = (v - v_ave) * tilt + v_ave
        enh[0], enh[-1] = v[0], v[-1]
        oracle[f] = enh
    np.testing.assert_allclose(got, oracle, atol=1e-4)


def test_post_filter_merlin_runs_and_preserves_scale(predicted_params):
    mag = predicted_params[0][:60]
    out = np.asarray(post_filter_merlin(jnp.asarray(mag, jnp.float32), 48000))
    assert out.shape == mag.shape
    assert np.all(np.isfinite(out))
    # the gain-matching step keeps overall level close
    assert np.abs(np.mean(out) - np.mean(mag)) < 1.0


def test_var_const_rate_interp_roundtrip():
    """var->const then const->var recovers smooth features."""
    fs = 48000
    n = 80
    rng = np.random.RandomState(0)
    shifts = rng.choice([220, 240, 260], size=n)
    pm = np.cumsum(shifts)
    t = pm / fs
    m = np.stack([np.sin(2 * np.pi * 3 * t), np.cos(2 * np.pi * 2 * t)], 1)

    m_const = np.asarray(framerate.interp_from_variable_to_const_frm_rate(
        m, pm, 5.0, fs))
    # walk back to variable rate
    v_shift_c = np.full(m_const.shape[0], 240.0)
    sh, locs = framerate.get_shifts_and_frm_locs_from_const_shifts(
        v_shift_c, 5.0, fs)
    m_var = np.asarray(framerate.interp_from_const_to_variable_rate(
        m_const, locs, 5.0, fs))
    # compare against ground truth at the recovered locations
    truth = np.stack([np.sin(2 * np.pi * 3 * locs / fs),
                      np.cos(2 * np.pi * 2 * locs / fs)], 1)
    assert np.max(np.abs(m_var - truth)) < 0.01
