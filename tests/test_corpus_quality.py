"""Corpus-level quality gate over ALL 10 demo utterances.

The reference's de-facto acceptance test is "run the demos and listen"
(README.md:57-66).  This gate makes it mechanical, for the whole demo
corpus rather than one utterance:

* lossless copy synthesis (tracker -> analysis_lossless ->
  synthesis_from_lossless, magphase.py:2869-2906 + 1759-1776) must
  reconstruct every utterance to sub-PCM16 accuracy;
* the full compressed loop (tracker -> analysis_compressed ->
  synthesis_from_compressed, magphase.py:2947-2988 + 825-997) must keep
  the mean aligned mel-spectral distortion below a recorded threshold —
  a voicing/tracker regression on ANY demo utterance turns this red.
"""
import glob

import numpy as np
import jax
import pytest

from magphase_tpu.io import read_wav

DATA = "/root/reference/demos/data_48k/wavs_nat"
FS = 48000

# recorded corpus values (CPU, PRNGKey(0), floor_db=40, round 3, after
# the guarded shift truncation): per-utt MSD 3.8..8.34 dB, mean 6.24 dB —
# identical for the live tracker and the recorded-epochs fixture
# (tests/data/epochs_48k.npz).
# Gates sit at recorded + ~0.5 dB and are DECOMPOSED: the fixture gate
# moves only with mel-compression/synthesis changes; the live gate also
# moves with tracker changes — a tracker regression flips exactly one.
MSD_MEAN_MAX = 6.8
MSD_UTT_MAX = 8.9
MSD_MEAN_MAX_LIVE = 7.0
MSD_UTT_MAX_LIVE = 9.1

EPOCH_FIXTURE = "tests/data/epochs_48k.npz"


@pytest.fixture(scope="module")
def corpus():
    wavs = sorted(glob.glob(f"{DATA}/*.wav"))
    assert len(wavs) == 10
    return [w.rsplit("/", 1)[1][:-4] for w in wavs], \
        [read_wav(w)[0] for w in wavs]


def test_lossless_copy_synthesis_whole_corpus(corpus):
    from magphase_tpu.parallel.copy_synthesis import copy_synthesis_batch
    toks, sigs = corpus
    outs = copy_synthesis_batch(sigs, FS)
    for tok, sig, syn in zip(toks, sigs, outs):
        n = min(len(sig), len(syn))
        err = np.abs(syn[2000:n - 2000] - sig[2000:n - 2000])
        # recorded corpus values: p99 <= 1.8e-7, max <= 8e-7 — well below
        # one PCM16 step (2^-15); gate at half a step
        assert np.percentile(err, 99) < 2.0 ** -16, \
            f"{tok}: p99 err {np.percentile(err, 99):.2e}"


def _corpus_msd(toks, sigs, epochs=None):
    from magphase_tpu.parallel.analysis_batch import \
        analysis_compressed_batch
    from magphase_tpu.parallel.batch import synthesis_from_compressed_batch
    from magphase_tpu.utils.eval import mel_spectral_distortion

    feats = analysis_compressed_batch(sigs, FS, epochs=epochs)
    utts = [(m, r, i, l) for (m, r, i, l, _s) in feats]
    outs = synthesis_from_compressed_batch(utts, FS,
                                           key=jax.random.PRNGKey(0))
    return {tok: mel_spectral_distortion(sig, np.asarray(syn), FS,
                                         floor_db=40.0)
            for tok, sig, syn in zip(toks, sigs, outs)}


def test_compressed_loop_msd_fixed_epochs(corpus):
    """Mel-compression + synthesis error in ISOLATION: epochs come from
    the recorded fixture, so tracker changes cannot move this gate."""
    import os
    toks, sigs = corpus
    fix = np.load(os.path.join(os.path.dirname(__file__), "data",
                               "epochs_48k.npz"))
    epochs = [(fix[f"{t}_pm"], fix[f"{t}_voi"]) for t in toks]
    msds = _corpus_msd(toks, sigs, epochs=epochs)
    mean = float(np.mean(list(msds.values())))
    assert mean < MSD_MEAN_MAX, msds
    bad = {t: m for t, m in msds.items() if m >= MSD_UTT_MAX}
    assert not bad, f"per-utterance MSD over {MSD_UTT_MAX} dB: {bad}"


def test_compressed_loop_msd_whole_corpus(corpus):
    """Full LIVE loop (tracker in the loop): a tracker regression of
    >= ~0.3 dB mean or any badly-tracked utterance turns this red while
    the fixed-epochs gate above stays green."""
    toks, sigs = corpus
    msds = _corpus_msd(toks, sigs)
    mean = float(np.mean(list(msds.values())))
    assert mean < MSD_MEAN_MAX_LIVE, msds
    bad = {t: m for t, m in msds.items() if m >= MSD_UTT_MAX_LIVE}
    assert not bad, f"per-utterance MSD over {MSD_UTT_MAX_LIVE} dB: {bad}"
