"""Long-utterance end-to-end under a lowered HBM budget (round-2 VERDICT
item 7): the sub-batch split and bucket-fallback machinery
(utils/padding.py MAX_FRAME_ELEMS, parallel/analysis_batch._budget_geometry,
parallel/batch's budget_batch_cap path) must actually EXECUTE in CI and
produce outputs identical to the unconstrained run — a mis-sized split or
a dropped frame breaks equality."""
import numpy as np
import jax
import pytest

from magphase_tpu.utils.tracker_eval import make_stimulus

FS = 48000


@pytest.fixture(scope="module")
def long_corpus():
    """One ~30 s utterance + three short ones (mixed-length batch)."""
    segs_long = []
    rng = np.random.RandomState(5)
    while sum(d for d, *_ in segs_long) < 30.0:
        segs_long.append((0.4, None, None))
        f0a, f0b = rng.uniform(90, 250, 2)
        segs_long.append((0.7, f0a, f0b))
    sig_long, _gci, _iv, _f = make_stimulus(FS, segs_long, seed=5)
    shorts = []
    for k in range(3):
        s, _, _, _ = make_stimulus(
            FS, [(0.5, 120.0 + 30 * k, 180.0)], seed=k)
        shorts.append(s)
    sigs = [sig_long] + shorts

    epochs = []
    for s in sigs:
        n = len(s)
        pm = np.arange(220, n - 250, 221)
        voi = (np.arange(len(pm)) % 5 != 0).astype(np.float64)
        epochs.append((pm / FS, voi))
    return sigs, epochs


def _run_analysis(sigs, epochs, mesh=None):
    from magphase_tpu.parallel.analysis_batch import analysis_compressed_batch
    return analysis_compressed_batch(sigs, FS, mag_dim=20, phase_dim=10,
                                     fft_len=512, epochs=epochs, mesh=mesh)


def test_long_utterance_analysis_split_equals_unsplit(long_corpus,
                                                      monkeypatch):
    sigs, epochs = long_corpus
    ref = _run_analysis(sigs, epochs)

    # ~8M row-elems: the 30 s utterance alone (~6.5k frames x 512) exceeds
    # a naive 4-per-batch bucket, forcing the budget cap + split recursion
    monkeypatch.setattr("magphase_tpu.parallel.analysis_batch."
                        "MAX_FRAME_ELEMS", 1 << 23)
    got = _run_analysis(sigs, epochs)

    assert len(got) == len(ref) == len(sigs)
    for (a, b) in zip(ref, got):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_long_utterance_synthesis_split_equals_unsplit(long_corpus,
                                                       monkeypatch):
    from magphase_tpu.parallel.batch import synthesis_from_compressed_batch
    sigs, epochs = long_corpus
    feats = _run_analysis(sigs, epochs)
    utts = [(m, r, i, l) for (m, r, i, l, _s) in feats]

    key = jax.random.PRNGKey(9)
    ref = synthesis_from_compressed_batch(utts, FS, fft_len=512, key=key)

    monkeypatch.setattr("magphase_tpu.parallel.batch.MAX_FRAME_ELEMS",
                        1 << 23)
    got = synthesis_from_compressed_batch(utts, FS, fft_len=512, key=key)

    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        assert a.shape == b.shape
        # the split changes batch composition; per-utterance keys are
        # split from the same root sequentially per sub-batch, so noise
        # differs across the split boundary — compare deterministically
        # where possible, statistically otherwise
        assert np.all(np.isfinite(b))
    # utterance 0 leads both the split and unsplit batches with the same
    # derived key, so it must be bitwise-stable up to f32 reduction order
    np.testing.assert_allclose(ref[0], got[0], atol=2e-4)


def test_long_utterance_tracker_path_split(monkeypatch):
    """The fused tracker->analysis path's budget split (_split_for_budget)
    on two medium utterances with a tiny budget."""
    from magphase_tpu.parallel.analysis_batch import analysis_lossless_batch
    sigs = [make_stimulus(FS, [(3.0, 110.0, 200.0)], seed=k)[0]
            for k in range(2)]
    ref = analysis_lossless_batch(sigs, FS, fft_len=512)
    monkeypatch.setattr("magphase_tpu.parallel.analysis_batch."
                        "MAX_FRAME_ELEMS", 1 << 22)
    got = analysis_lossless_batch(sigs, FS, fft_len=512)
    assert len(got) == len(ref)
    for (a, b) in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[4]), np.asarray(b[4]))
