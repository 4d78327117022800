"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware, before jax initialises."""
import os

# force CPU with 8 virtual devices: the environment pins JAX_PLATFORMS=axon
# (remote TPU tunnel; sitecustomize registers the plugin at interpreter
# start), which would run every eager op over the network.  jax.config wins
# over the env var even after the plugin registered.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_DEMO_DIR = "/root/reference/demos/data_48k"


@pytest.fixture(scope="session")
def demo_wav():
    """hvd_593.wav, the demo utterance (demo_copy_synthesis_lossless.py:60)."""
    from magphase_tpu.io import read_wav
    sig, fs = read_wav(os.path.join(REF_DEMO_DIR, "wavs_nat", "hvd_593.wav"))
    return sig, fs


@pytest.fixture(scope="session")
def synthetic_pm():
    """Deterministic pseudo pitch marks with exactly fs-divisor shifts, so
    the f0 <-> shift round trip is float-exact (see tests for rationale)."""
    rng = np.random.RandomState(0)
    shifts = rng.choice([200, 240, 250, 300, 320, 400, 480], size=400)
    pm = np.cumsum(shifts)
    return pm, shifts
