"""The fused acoustic-model+vocoder serving program
(examples/serving_on_device.py) compiles and produces sane PCM16 audio
in one jit — the deployment shape behind the device throughput numbers."""
import os
import runpy

import jax
import numpy as np

EXAMPLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "serving_on_device.py")


def test_fused_tts_step_one_program():
    ns = runpy.run_path(EXAMPLE)
    # shrink the workload for CI (functions read module globals, which
    # run_path hands back as this same dict)
    ns["B"], ns["F"] = 2, 64

    params = ns["init_acoustic_params"](jax.random.PRNGKey(0), hidden=64)
    ling = jax.random.normal(jax.random.PRNGKey(1), (2, 64, ns["LING_DIM"]))
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    tts_step = ns["build_tts_step"]()
    pcm, lens = tts_step(params, ling, keys)
    pcm, lens = np.asarray(pcm), np.asarray(lens)
    assert pcm.dtype == np.int16
    for b in range(2):
        n = int(lens[b])
        assert n > 64 * 100                 # ~64 frames of voiced audio
        x = pcm[b, :n].astype(np.float64) / 32768.0
        assert 0.5 < np.abs(x).max() <= 1.0   # peak-normalised to 0.98
        assert np.std(x) > 1e-3
        # padding beyond the valid length stays zero
        assert np.all(pcm[b, n + 1:] == 0)
