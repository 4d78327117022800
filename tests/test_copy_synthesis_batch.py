"""Fused device copy-synthesis pipeline."""
import numpy as np

from magphase_tpu.io import read_wav
from magphase_tpu.parallel.copy_synthesis import copy_synthesis_batch
from magphase_tpu.epochs import tracker
from magphase_tpu.epochs.placement_device import place_epochs_kernel

DATA = "/root/reference/demos/data_48k/wavs_nat"


def test_device_epoch_placement_matches_host():
    sig, fs = read_wav(f"{DATA}/hvd_593.wav")
    f0, voiced, step, y_snap = tracker.track_f0(sig, fs)
    pm_h, voi_h = tracker.place_epochs(sig, fs, f0, voiced, y_snap)

    import jax.numpy as jnp
    from magphase_tpu.utils.padding import bucket, pad_to
    S = bucket(len(sig), 1 << 15)
    marks, flags, n_marks = place_epochs_kernel(
        jnp.asarray(pad_to(y_snap.astype(np.float32), S)),
        jnp.asarray(f0.astype(np.float32)),
        jnp.asarray(voiced.astype(np.float32)),
        jnp.int32(len(sig)), fs=fs, m_max=1024)
    n = int(n_marks)
    pm_d = np.asarray(marks)[:n]
    voi_d = np.asarray(flags)[:n]

    pm_h_smpls = np.round(pm_h * fs).astype(int)
    # the two walks implement the same algorithm: sample-exact agreement
    assert n == len(pm_h_smpls)
    assert np.array_equal(pm_d, pm_h_smpls)
    assert np.array_equal(voi_d, voi_h)


def test_copy_synthesis_batch_reconstructs():
    sigs = [read_wav(f"{DATA}/{t}.wav")[0] for t in ("hvd_593", "hvd_594")]
    outs = copy_synthesis_batch(sigs, 48000)
    for sig, syn in zip(sigs, outs):
        n = min(len(sig), len(syn))
        err = np.abs(syn[2000:n - 2000] - sig[2000:n - 2000])
        assert np.percentile(err, 99) < 2 ** -13, \
            f"p99 err {np.percentile(err, 99):.2e}"
