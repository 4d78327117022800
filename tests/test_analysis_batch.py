"""Batched analysis vs single-utterance path."""
import numpy as np

from magphase_tpu.io import read_wav
from magphase_tpu.parallel.analysis_batch import (analysis_compressed_batch,
                                                  analysis_lossless_batch,
                                                  track_f0_batch)
from magphase_tpu.epochs.tracker import track_f0

DATA = "/root/reference/demos/data_48k/wavs_nat"


def _load(tok):
    return read_wav(f"{DATA}/{tok}.wav")[0]


def test_track_batch_matches_single():
    sigs = [_load("hvd_593"), _load("hvd_594")]
    batch = track_f0_batch(sigs, 48000)
    for sig, (f0_b, voi_b, _) in zip(sigs, batch):
        f0_s, voi_s, _, _ = track_f0(sig, 48000)
        assert len(f0_b) == len(f0_s)
        agree = np.mean(voi_b == voi_s)
        assert agree > 0.97, f"voicing agreement {agree}"
        sel = voi_b & voi_s & (f0_s > 0)
        rel = np.abs(f0_b[sel] - f0_s[sel]) / f0_s[sel]
        assert np.median(rel) < 0.01


def test_lossless_batch_shapes_and_roundtrip():
    sigs = [_load("hvd_593"), _load("hvd_594")]
    feats = analysis_lossless_batch(sigs, 48000)
    assert len(feats) == 2
    for sig, (mag, real, imag, f0, sh) in zip(sigs, feats):
        assert mag.shape[1] == 2049
        assert mag.shape[0] == len(f0) == len(sh)
        # round-trip reconstruction via the single synthesis path
        from magphase_tpu.vocoder import synthesis_from_lossless
        syn = synthesis_from_lossless(mag.astype(np.float64),
                                      real.astype(np.float64),
                                      imag.astype(np.float64), f0, 48000)
        n = min(len(syn), len(sig))
        err = np.abs(syn[2000:n - 2000] - sig[2000:n - 2000])
        assert np.percentile(err, 99) < 2 ** -13


def test_compressed_batch_output_dims():
    sigs = [_load("hvd_593")]
    out = analysis_compressed_batch(sigs, 48000, mag_dim=60, phase_dim=45)
    mml, mrm, mim, lf0, sh = out[0]
    assert mml.shape[1] == 60 and mrm.shape[1] == 45
    assert np.all(np.abs(mrm) <= 1.0)
    voiced = lf0 > -1e9
    assert 0.1 < voiced.mean() < 0.9
