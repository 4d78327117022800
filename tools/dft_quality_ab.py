#!/usr/bin/env python
"""On-device quality A/B of the fast DFT paths (noise-grade bf16 rfft +
3-pass direct irfft) vs the exact f32 two-stage paths.

Runs the full compressed pipeline (analysis on device with fixed
tracker epochs, then synthesis with the SAME noise key) twice on real
speech — once per DFT configuration — and reports max waveform deviation
and mel-spectral distortion between the two outputs.  Anything well
under the ~10 dB MSD between two noise keys (and under the f16 feature
transport's ~0.26 dB) certifies the fast paths are quality-neutral.

Usage: python tools/dft_quality_ab.py [wav]
Spawns one subprocess per configuration (env vars are read at trace
time; a fresh process per config keeps the A/B honest).
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAV = "/root/reference/demos/data_48k/wavs_nat/hvd_591.wav"


def run_one(out_npz: str, exact: bool, wav: str):
    env = dict(os.environ)
    if exact:
        env["MAGPHASE_NOISE_RFFT"] = "f32"
        env["MAGPHASE_IRFFT"] = "two_stage"
        env["MAGPHASE_ANALYSIS_RFFT"] = "native"
    code = f"""
import sys, numpy as np
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from magphase_tpu.io import read_wav
from magphase_tpu.parallel.analysis_batch import analysis_compressed_batch
from magphase_tpu.parallel.batch import synthesis_from_compressed_batch
import jax
sig, fs = read_wav({wav!r})
feats = analysis_compressed_batch([sig], fs)
m, r, i, l, sh = feats[0]
outs = synthesis_from_compressed_batch(
    [(np.asarray(m, np.float32), np.asarray(r, np.float32),
      np.asarray(i, np.float32), np.asarray(l, np.float32))], fs,
    key=jax.random.PRNGKey(7))
w = np.asarray(outs[0])
np.savez({out_npz!r}, w=w, fs=fs)
"""
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   timeout=1800)


def main():
    import numpy as np

    wav = sys.argv[1] if len(sys.argv) > 1 else WAV
    run_one("/tmp/dft_ab_fast.npz", False, wav)
    run_one("/tmp/dft_ab_exact.npz", True, wav)
    a = np.load("/tmp/dft_ab_fast.npz")
    b = np.load("/tmp/dft_ab_exact.npz")
    wa, wb, fs = a["w"], b["w"], int(a["fs"])
    n = min(len(wa), len(wb))
    dev = np.max(np.abs(wa[:n] - wb[:n]))
    from magphase_tpu.utils.eval import mel_spectral_distortion
    msd = mel_spectral_distortion(wb[:n], wa[:n], fs)
    print(json.dumps({"len_fast": int(len(wa)), "len_exact": int(len(wb)),
                      "max_abs_dev": float(dev),
                      "msd_db": float(msd),
                      "peak": float(np.abs(wb).max())}))


if __name__ == "__main__":
    main()
