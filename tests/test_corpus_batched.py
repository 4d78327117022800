"""Batched corpus runner: chunk fault isolation, crash list, resume."""
import os

from magphase_tpu.utils.corpus import run_corpus_batched


def test_batched_isolation_and_resume(tmp_path):
    out = str(tmp_path / "feats")
    crash = str(tmp_path / "crash.scp")
    tokens = [f"utt_{i:02d}" for i in range(10)]
    calls = []

    def process_batch(chunk):
        calls.append(tuple(chunk))
        if "utt_04" in chunk:
            raise RuntimeError("bad wav")
        return [1.0] * len(chunk)

    res = run_corpus_batched(tokens, process_batch, out, batch_size=4,
                             crash_list_path=crash)
    # only the bad utterance fails; its chunk-mates succeed via retries
    assert res.failed == ["utt_04"]
    assert sorted(res.done) == sorted(t for t in tokens if t != "utt_04")
    with open(crash) as f:
        assert f.read().split() == ["utt_04"]
    # the failing chunk was retried one token at a time
    assert ("utt_04",) in calls

    # resume: everything done is skipped, the failed token is retried
    calls.clear()

    def process_batch_ok(chunk):
        calls.append(tuple(chunk))
        return [1.0] * len(chunk)

    res2 = run_corpus_batched(tokens, process_batch_ok, out, batch_size=4,
                              crash_list_path=crash)
    assert res2.done == ["utt_04"]
    assert len(res2.skipped) == 9
    assert calls == [("utt_04",)]
