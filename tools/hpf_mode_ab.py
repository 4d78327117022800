#!/usr/bin/env python
"""A/B of the output-HPF application mode in batched compressed synthesis.

Modes (MAGPHASE_HPF_MODE, parallel/batch.py:_fused_batch_impl):
  * blocked   — reference-faithful: 40 Hz Butterworth applied to the
    OLA'd signal as blocked FFT convolution with the exact truncated
    impulse response (magphase.py:990-995; core/filters.py:sosfilt).
    Measured ~26% of the fused device iteration (tools/synth_breakdown).
  * spectral  — the filter folded into the per-frame synthesis spectra
    as a per-bin complex gain (exact IIR frequency response at the frame
    bins; core/filters.py:sos_freq_response_rfft).  HPF is LTI so it
    commutes with the OLA sum; the approximation error is the per-frame
    circular wrap plus non-commutation with the anti-ringing window.

`quality` (CPU ok): copy-synthesis MSD vs the natural wavs for BOTH
modes over the 10 demo utterances (fixed-epoch fixture, PRNGKey(0) —
the same harness as tests/test_corpus_quality.py), plus the cross-mode
piecewise MSD and waveform deviation.  The decision scale: the int8
feature transport was adopted at ~0.26 dB MSD perturbation; the spread
between two noise keys is ~10 dB global / 0.62 dB piecewise.

`device` (TPU): fused-iteration time via the scan-loop kernel
(tools/device_bench.py) for both modes.

DECISION RECORD (round 5, measured): spectral adopted as default.
  * device (B=128, v5e, 2 interleaved reps): blocked 30.52/30.27 ms/iter
    (7432/7492 audio-s/s) vs spectral 22.57/22.58 (10047/10043) — 1.34x.
  * quality (10 demo utts, fixed epochs, PRNGKey(0)): MSD vs natural
    7.206 dB spectral vs 7.226 blocked (delta -0.019); untrimmed worst
    chunk 16.6 vs 16.8; cross-mode piecewise MSD 1.305 dB (cross
    rel-RMS 3.8%) — well under a noise-key change.
  * the one regression: sub-25 Hz rumble rejection 4.9x vs blocked's
    73x (hvd_704 lo-band RMS 30.8 -> 6.3 vs 0.42).  The floor is
    anti-ringing-window spectral leakage from the 50-150 Hz band back
    into the zeroed bins (window mainlobe ~2-4 bins at fft 2048), not
    the filter: a steeper H cannot go below it.  Residual sits -22 dB
    under the speech band (inaudible at sub-25 Hz; wav writes are
    peak-normalised, so headroom is unaffected); MAGPHASE_HPF_MODE=
    blocked restores exact reference-shaped rejection.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import glob
import time

import numpy as np

DATA = "/root/reference/demos/data_48k/wavs_nat"
PRED = "/root/reference/demos/data_48k/params_predicted"
FS = 48000


def _corpus():
    from magphase_tpu.io import read_wav
    wavs = sorted(glob.glob(f"{DATA}/*.wav"))
    return ([w.rsplit("/", 1)[1][:-4] for w in wavs],
            [read_wav(w)[0] for w in wavs])


def quality():
    import jax
    from magphase_tpu.parallel.analysis_batch import \
        analysis_compressed_batch
    from magphase_tpu.parallel import batch as pb
    from magphase_tpu.utils.eval import mel_spectral_distortion_piecewise

    toks, sigs = _corpus()
    fix = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "epochs_48k.npz"))
    epochs = [(fix[f"{t}_pm"], fix[f"{t}_voi"]) for t in toks]
    feats = analysis_compressed_batch(sigs, FS, epochs=epochs)
    utts = [(m, r, i, l) for (m, r, i, l, _s) in feats]

    outs = {}
    for mode in ("blocked", "spectral"):
        os.environ["MAGPHASE_HPF_MODE"] = mode
        outs[mode] = pb.synthesis_from_compressed_batch(
            utts, FS, key=jax.random.PRNGKey(0))

    print(f"{'utt':>8} {'msd_blocked':>11} {'wrstA':>6} "
          f"{'msd_spectral':>12} {'wrstB':>6} "
          f"{'cross_msd':>9} {'cross_relrms':>12}")
    rows = []
    for k, (tok, sig) in enumerate(zip(toks, sigs)):
        a = np.asarray(outs["blocked"][k])
        b = np.asarray(outs["spectral"][k])
        ma, wa = mel_spectral_distortion_piecewise(
            sig, a, FS, floor_db=40.0, return_worst=True)
        mb, wb = mel_spectral_distortion_piecewise(
            sig, b, FS, floor_db=40.0, return_worst=True)
        mx = mel_spectral_distortion_piecewise(a, b, FS, floor_db=40.0)
        rel = float(np.sqrt(np.mean((a - b) ** 2) / np.mean(a ** 2)))
        rows.append((ma, mb, mx, rel, wa, wb))
        print(f"{tok:>8} {ma:11.3f} {wa:6.1f} {mb:12.3f} {wb:6.1f} "
              f"{mx:9.3f} {rel:12.2e}")
    r = np.asarray(rows)
    print(f"{'mean':>8} {r[:, 0].mean():11.3f} {r[:, 4].max():6.1f} "
          f"{r[:, 1].mean():12.3f} {r[:, 5].max():6.1f} "
          f"{r[:, 2].mean():9.3f} {r[:, 3].mean():12.2e}")
    print(f"delta mean MSD (spectral - blocked): "
          f"{r[:, 1].mean() - r[:, 0].mean():+.3f} dB; "
          f"worst chunk {r[:, 4].max():.1f} -> {r[:, 5].max():.1f}")


def device():
    import jax
    from magphase_tpu.io import read_binfile
    from device_bench import build_loop_kernel, prepare_args

    toks = ["hvd_704", "hvd_705", "hvd_706", "hvd_708"]
    utts = []
    for i in range(128):
        t = toks[i % len(toks)]
        utts.append((read_binfile(f"{PRED}/{t}.mag", 60),
                     read_binfile(f"{PRED}/{t}.real", 45),
                     read_binfile(f"{PRED}/{t}.imag", 45),
                     read_binfile(f"{PRED}/{t}.lf0", 1)))
    key = jax.random.PRNGKey(0)
    for mode in ("blocked", "spectral", "blocked", "spectral"):
        os.environ["MAGPHASE_HPF_MODE"] = mode
        args, statics, audio_s = prepare_args(utts, FS, 4096)
        loop = build_loop_kernel()
        times = {}
        for iters in (2, 18, 2, 18):
            t0 = time.perf_counter()
            v = float(jax.device_get(loop(*args, key, iters=iters,
                                          **statics)))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        assert np.isfinite(v)
        per_iter = (min(times[18]) - min(times[2])) / 16.0
        print(f"{mode:>9}: {per_iter * 1e3:7.2f} ms/iter   "
              f"{audio_s / per_iter:8.1f} audio-s/s")


if __name__ == "__main__":
    {"quality": quality, "device": device}[
        sys.argv[1] if len(sys.argv) > 1 else "quality"]()
