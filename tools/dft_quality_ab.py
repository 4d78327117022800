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


def run_one(out_npz: str, config: str, wav: str):
    env = dict(os.environ)
    # clear ambient DFT knobs first: an exported MAGPHASE_IRFFT in the
    # operator's shell would silently change what a labeled config
    # measures (each config sets exactly what it means below)
    for k in ("MAGPHASE_NOISE_RFFT", "MAGPHASE_IRFFT",
              "MAGPHASE_ANALYSIS_RFFT"):
        env.pop(k, None)
    if config == "exact":
        env["MAGPHASE_NOISE_RFFT"] = "f32"
        env["MAGPHASE_IRFFT"] = "two_stage"
        env["MAGPHASE_ANALYSIS_RFFT"] = "native"
    elif config == "irfft_bf16":
        env["MAGPHASE_IRFFT"] = "bf16"
    elif config != "fast":
        raise ValueError(config)
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
    configs = (sys.argv[2].split(",") if len(sys.argv) > 2
               else ["fast", "exact"])
    for c in configs:
        run_one(f"/tmp/dft_ab_{c}.npz", c, wav)
    from magphase_tpu.utils.eval import mel_spectral_distortion
    ref_cfg = configs[-1]
    b = np.load(f"/tmp/dft_ab_{ref_cfg}.npz")
    wb, fs = b["w"], int(b["fs"])
    out = {"ref": ref_cfg, "peak": float(np.abs(wb).max())}
    for c in configs[:-1]:
        a = np.load(f"/tmp/dft_ab_{c}.npz")
        wa = a["w"]
        n = min(len(wa), len(wb))
        out[f"{c}_max_abs_dev"] = float(np.max(np.abs(wa[:n] - wb[:n])))
        out[f"{c}_msd_db"] = float(mel_spectral_distortion(
            wb[:n], wa[:n], fs))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
