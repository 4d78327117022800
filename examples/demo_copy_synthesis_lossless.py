#!/usr/bin/env python
"""Lossless copy-synthesis demo (reference:
demos/demo_copy_synthesis_lossless.py).

Extracts high-resolution MagPhase parameters (mag / real / imag / f0) from a
wave file — epochs via the built-in JAX tracker — and resynthesises it.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from magphase_tpu.io import write_audio_file, get_filename, mkdir
from magphase_tpu.vocoder import analysis_lossless, synthesis_from_lossless

if __name__ == "__main__":
    wav_file_orig = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/demos/data_48k/wavs_nat/hvd_593.wav"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/magphase_tpu_syn"
    mkdir(out_dir)

    print("Analysing...")
    m_mag, m_real, m_imag, v_f0, fs, v_shift = analysis_lossless(wav_file_orig)

    print("Synthesising...")
    v_syn_sig = synthesis_from_lossless(m_mag, m_real, m_imag, v_f0, fs)

    out = os.path.join(out_dir,
                       get_filename(wav_file_orig) + "_copy_syn_lossless.wav")
    write_audio_file(out, v_syn_sig, fs)
    print("Wrote", out)
