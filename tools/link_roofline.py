#!/usr/bin/env python
"""Host-link roofline for the analysis E2E pipeline (round-2 VERDICT
item 5): measure the tunnel's SUSTAINED synchronous transfer rates under
the analysis pipeline's actual access pattern, derive the bytes-limited
throughput bound, and compare the measured E2E number against it.

The analysis pipeline per group of B utterances moves:
  upload   — one (B, S) int16 signal-row tensor (assemble_signal_rows);
  download — (B, F, 60+45+45) float16 mel streams + (B, F) f32 lf0/shift
             + tiny (B,) mark counts.

Usage:  python tools/link_roofline.py [batch]
Prints one JSON line with measured MB/s each way, the implied bound in
audio-s/s, and the measured E2E for the same workload.
"""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAV_DIR = "/root/reference/demos/data_48k/wavs_nat"
FS = 48000


def measure(batch: int = 64) -> dict:
    import jax
    import jax.numpy as jnp
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel.analysis_batch import (
        analysis_compressed_batch_async, assemble_signal_rows,
        _budget_geometry)
    from magphase_tpu.utils.padding import bucket, FRM_STEP

    signals = [read_wav(w)[0]
               for w in sorted(glob.glob(os.path.join(WAV_DIR, "*.wav")))]
    batch_sigs = [signals[i % len(signals)] for i in range(batch)]
    audio_s = sum(len(s) for s in batch_sigs) / FS

    # --- the pipeline's actual upload tensor
    S, m_max, _ = _budget_geometry(batch_sigs, FS, 4096)
    rows = assemble_signal_rows(batch_sigs, batch, S)
    up_bytes = rows.nbytes

    # --- the pipeline's actual download tensors (realistic frame bucket:
    # ~0.4 marks/sample-rate-second of audio; use the tracker's typical
    # yield of ~170 marks/s at 48 kHz speech).  The pipelined path packs
    # the mel streams + aux into two tensors (analysis_batch.py
    # _analyze_compress_impl pack=True).
    F = bucket(int(np.ceil(max(len(s) for s in batch_sigs) / FS * 200)),
               FRM_STEP)
    feats16 = np.zeros((batch, F, 150), np.float16)
    lf0_sh = np.zeros((batch, F, 2), np.float32)
    down_bytes = feats16.nbytes + lf0_sh.nbytes

    # measure SYNC rates (device_get after each put forces completion;
    # this is the per-dispatch mode every process ends up in after its
    # first device_get — see CLAUDE.md axon notes)
    dev = jax.devices()[0]
    probe = jax.device_put(np.zeros(1, np.float32), dev)
    _ = np.asarray(jax.device_get(probe))        # flip into sync mode

    def time_upload(x, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            buf = jax.device_put(x, dev)
            buf.block_until_ready()
            best = min(best, time.perf_counter() - t0)
            del buf
        return best

    def time_download(shape_arr, reps=4):
        # the buffers must be DEVICE-COMPUTED *and distinct per rep*:
        # device_get of a device_put array can return the retained host
        # copy, and a repeat get of the SAME buffer is served from a host
        # cache at no transfer cost (round-3 roofline recorded a bogus
        # 562 GB/s downstream this way)
        mk = jax.jit(lambda x, s: x + s)
        base = jax.device_put(shape_arr, dev)
        bufs = [mk(base, jnp.asarray(i + 1, shape_arr.dtype))
                for i in range(reps)]
        jax.block_until_ready(bufs)
        best = float("inf")
        for b in bufs:
            t0 = time.perf_counter()
            _ = np.asarray(jax.device_get(b))
            best = min(best, time.perf_counter() - t0)
        return best

    # --- device time for the same group (scan-loop, contention-immune)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from device_bench import bench_analysis_phases
    dev_audio_per_s = bench_analysis_phases(batch=24)
    t_dev = audio_s / dev_audio_per_s

    # bounds are sampled BEFORE and AFTER the E2E reps and averaged: the
    # tunnel's rates drift minute to minute, and a bound measured in a
    # different weather window than the E2E makes the ratio meaningless
    # (observed 0.58 vs 0.96 across runs of the same code)
    t_up = time_upload(rows)
    t_down = time_download(feats16) + time_download(lf0_sh)

    # --- measured E2E on the same workload (best of 5: individual reps
    # swing with the same minute-scale weather the bounds do; enough
    # reps let at least one land in the bound-sample windows)
    f = analysis_compressed_batch_async(batch_sigs, FS)
    f()                                          # warmup/compile
    best_e2e = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        analysis_compressed_batch_async(batch_sigs, FS)()
        best_e2e = min(best_e2e, time.perf_counter() - t0)
    e2e = audio_s / best_e2e

    t_up = 0.5 * (t_up + time_upload(rows))
    t_down = 0.5 * (t_down + time_download(feats16)
                    + time_download(lf0_sh))

    # bounds: perfectly-overlapped (limited by the slowest leg) and
    # fully-serial (sum of legs)
    bound_overlap = audio_s / max(t_up, t_down, t_dev)
    bound_serial = audio_s / (t_up + t_down + t_dev)

    return {
        "audio_s_per_group": round(audio_s, 2),
        "upload_MB": round(up_bytes / 1e6, 2),
        "upload_s": round(t_up, 4),
        "upload_MBps": round(up_bytes / 1e6 / t_up, 1),
        "download_MB": round(down_bytes / 1e6, 2),
        "download_s": round(t_down, 4),
        "download_MBps": round(down_bytes / 1e6 / t_down, 1),
        "device_s": round(t_dev, 4),
        "bound_serial_audio_s_per_s": round(bound_serial, 1),
        "bound_overlap_audio_s_per_s": round(bound_overlap, 1),
        "e2e_audio_s_per_s": round(e2e, 1),
        "e2e_vs_serial_bound": round(e2e / bound_serial, 3),
        "e2e_vs_overlap_bound": round(e2e / bound_overlap, 3),
    }


if __name__ == "__main__":
    print(json.dumps(measure(
        int(sys.argv[1]) if len(sys.argv) > 1 else 64)))
