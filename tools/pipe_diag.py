#!/usr/bin/env python
"""Per-stage timing of the threaded production pipelines on the tunnel.

Usage:  python tools/pipe_diag.py analysis [batch]
        python tools/pipe_diag.py synth [batch] [iters]

Prints per-item stage durations (upload / compute / download) and the
implied steady-state audio-s/s, after a warmup pass.
"""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAV_DIR = "/root/reference/demos/data_48k/wavs_nat"
PRED_DIR = "/root/reference/demos/data_48k/params_predicted"
TOKENS = ["hvd_704", "hvd_705", "hvd_706", "hvd_708"]
FS = 48000


def _flip_sync():
    import jax
    probe = jax.device_put(np.zeros(8, np.float32), jax.devices()[0])
    _ = np.asarray(jax.device_get(probe))


def diag_analysis(batch=64):
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab

    signals = [read_wav(w)[0]
               for w in sorted(glob.glob(os.path.join(WAV_DIR, "*.wav")))]
    batch_sigs = [signals[i % len(signals)] for i in range(batch)]
    audio_s = sum(len(s) for s in batch_sigs) / FS

    # warmup (compiles) + flip into per-dispatch-sync mode
    ab.analysis_compressed_batch_async(batch_sigs, FS)()

    import magphase_tpu.utils.pipeline as pl
    times = {}
    orig = pl.run_staged

    class Spy(orig):
        def __init__(self, items, stages, depth=1):
            super().__init__(items, stages, depth)
            times["pipe"] = self

    pl.run_staged = Spy
    try:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ab.analysis_compressed_batch_async(batch_sigs, FS)()
            best = min(best, time.perf_counter() - t0)
    finally:
        pl.run_staged = orig
    pipe = times["pipe"]
    print(json.dumps({
        "audio_s": round(audio_s, 1),
        "wall_s": round(best, 3),
        "e2e_audio_s_per_s": round(audio_s / best, 1),
        "stage_s": {name: [round(t, 3) for t in ts]
                    for name, ts in zip(["upload", "compute", "download"],
                                        pipe.stage_times)},
    }))


def diag_lossless(batch=24):
    """Full-resolution lossless corpus extraction E2E: transport f32 vs
    'compact' (int16 phase angle, half the download bytes) through the
    threaded pipeline.  r3 baseline: ~4 audio-s/s, download-bound."""
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel.analysis_batch import analysis_lossless_batch

    signals = [read_wav(w)[0]
               for w in sorted(glob.glob(os.path.join(WAV_DIR, "*.wav")))]
    batch_sigs = [signals[i % len(signals)] for i in range(batch)]
    audio_s = sum(len(s) for s in batch_sigs) / FS

    transports = ("f32", "compact", "compact16")
    out = {"audio_s": round(audio_s, 1)}
    for transport in transports:                 # warmups (compiles)
        feats = analysis_lossless_batch(batch_sigs, FS,
                                        transport=transport)
        assert len(feats) == batch
    # interleaved reps: tunnel bandwidth drifts minute to minute, so
    # sequential per-transport blocks confound transport with time
    times = {t: [] for t in transports}
    for _ in range(3):
        for transport in transports:
            t0 = time.perf_counter()
            analysis_lossless_batch(batch_sigs, FS, transport=transport)
            times[transport].append(time.perf_counter() - t0)
    for transport, ts in times.items():
        out[transport] = {"wall_s": [round(t, 2) for t in ts],
                          "best_audio_s_per_s": round(audio_s / min(ts),
                                                      2)}
    print(json.dumps(out))


def diag_synth(batch=128, iters=8):
    import jax
    from magphase_tpu.io import read_binfile
    from magphase_tpu.parallel import batch as pb

    utts = []
    for i in range(batch):
        t = TOKENS[i % len(TOKENS)]
        utts.append((read_binfile(os.path.join(PRED_DIR, t + ".mag"), 60),
                     read_binfile(os.path.join(PRED_DIR, t + ".real"), 45),
                     read_binfile(os.path.join(PRED_DIR, t + ".imag"), 45),
                     read_binfile(os.path.join(PRED_DIR, t + ".lf0"), 1)))
    transport = os.environ.get("MAGPHASE_TRANSPORT", "f16")

    def batches(n):
        for i in range(n):
            keys = np.asarray(jax.random.split(jax.random.PRNGKey(i),
                                               len(utts)), np.uint32)
            yield utts, keys

    def consume(bufs, host):
        # serving consume: probe-sized check only (features come from an
        # on-device acoustic model in deployment; waveforms are consumed
        # on device or drained as PCM16 by the CLI path)
        v = float(np.asarray(jax.device_get(bufs[0, :8]))[0])
        return host["n_real"], v

    _flip_sync()
    # warmup pass (compiles)
    for _ in pb.synthesis_batches_pipelined(batches(1), FS,
                                            transport=transport,
                                            consume=consume):
        pass

    import magphase_tpu.utils.pipeline as pl
    spy = {}
    orig = pl.run_staged

    class Spy(orig):
        def __init__(self, items, stages, depth=1):
            super().__init__(items, stages, depth)
            spy["pipe"] = self

    audio_s_iter = sum(
        (np.cumsum(np.int64(FS / np.where(f0 == 0, 200.0, f0)))[-1])
        for f0 in (np.exp(np.squeeze(u[3])) for u in utts)) / FS

    pl.run_staged = Spy
    try:
        t0 = time.perf_counter()
        n_done = 0
        for r in pb.synthesis_batches_pipelined(batches(iters), FS,
                                                transport=transport,
                                                consume=consume):
            n_done += 1
        wall = time.perf_counter() - t0
    finally:
        pl.run_staged = orig
    pipe = spy["pipe"]
    print(json.dumps({
        "audio_s_iter": round(float(audio_s_iter), 1),
        "iters": iters,
        "wall_s": round(wall, 3),
        "e2e_audio_s_per_s": round(float(audio_s_iter) * iters / wall, 1),
        "transport": transport,
        "stage_s": {name: [round(t, 3) for t in ts]
                    for name, ts in zip(["upload", "execute", "download"],
                                        pipe.stage_times)},
    }))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "analysis":
        diag_analysis(int(sys.argv[2]) if len(sys.argv) > 2 else 64)
    elif mode == "lossless":
        diag_lossless(int(sys.argv[2]) if len(sys.argv) > 2 else 24)
    else:
        diag_synth(int(sys.argv[2]) if len(sys.argv) > 2 else 128,
                   int(sys.argv[3]) if len(sys.argv) > 3 else 8)
