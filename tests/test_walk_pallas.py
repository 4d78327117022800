"""The Pallas epoch walk must be bit-identical to the XLA while_loop walk.

Reference semantics under test: the epoch placement walk of
epochs/tracker.py:place_epochs (REAPER's role in magphase.py:2875-2879),
batched device form in epochs/placement_device.py.  The Pallas kernel
(pallas_kernels/walk_pallas.py) runs in interpret mode on CPU, so these
tests exercise the identical program the TPU compiles.
"""
import functools
import glob

import jax
import jax.numpy as jnp
import numpy as np


from magphase_tpu.epochs import placement_device as pd
from magphase_tpu.io import read_wav
from magphase_tpu.pallas_kernels.walk_pallas import place_epochs_pallas

WAVS = sorted(glob.glob("/root/reference/demos/data_48k/wavs_nat/*.wav"))
FS = 48000


def _walk_inputs(signals, fs):
    from magphase_tpu.parallel import analysis_batch as ab

    _, dev, S, Tmax, m_max, _ = ab._device_signal_batch(
        list(signals), fs, None, fft_len=4096)
    sigs_d, n_sigs_d, n_frames_d = dev
    sigs_f = ab._sigs_f32(sigs_d)
    y_snap, f0, voi = jax.vmap(functools.partial(
        pd._track_one, fs=fs, n_frames_max=Tmax))(sigs_f, n_frames_d)
    return y_snap, f0, voi, n_sigs_d, n_frames_d, m_max


def _both(y_snap, f0, voi, n_sigs, n_frames, fs, m_max):
    fstep = pd._walk_frame_step(fs)
    ref = jax.vmap(functools.partial(
        pd.place_epochs_kernel, fs=fs, m_max=m_max, frame_step=fstep))(
        y_snap, f0, voi, n_sigs, n_frames)
    got = place_epochs_pallas(y_snap, f0, voi,
                              n_sigs.astype(jnp.int32),
                              n_frames.astype(jnp.int32),
                              fs=fs, m_max=m_max, frame_step=fstep,
                              snap_w=pd._snap_win(fs))
    return ref, got


def _assert_equal(ref, got):
    r_marks, r_flags, r_nm = (np.asarray(x) for x in ref)
    g_marks, g_flags, g_nm = (np.asarray(x) for x in got)
    np.testing.assert_array_equal(g_nm, r_nm)
    np.testing.assert_array_equal(g_marks, r_marks)
    np.testing.assert_array_equal(g_flags, r_flags)


def test_walk_pallas_demo_corpus_exact():
    signals = [read_wav(w)[0] for w in WAVS[:6]]
    y, f0, voi, ns, nf, m_max = _walk_inputs(signals, FS)
    _assert_equal(*_both(y, f0, voi, ns, nf, FS, m_max))


def test_walk_pallas_capacity_hit():
    """n_marks == m_max at capacity, matching the XLA kernel exactly."""
    signals = [read_wav(w)[0] for w in WAVS[:2]]
    y, f0, voi, ns, nf, _ = _walk_inputs(signals, FS)
    _assert_equal(*_both(y, f0, voi, ns, nf, FS, 128))


def test_walk_pallas_noise_and_silence():
    """All-unvoiced (noise) and near-empty signals."""
    rng = np.random.RandomState(0)
    sigs = [rng.uniform(-0.3, 0.3, 48000), np.zeros(1024)]
    y, f0, voi, ns, nf, m_max = _walk_inputs(sigs, FS)
    _assert_equal(*_both(y, f0, voi, ns, nf, FS, m_max))


def test_walk_pallas_batch_chunking():
    """The SMEM chunk split (b_max) must not change results."""
    signals = [read_wav(w)[0] for w in WAVS[:4]]
    y, f0, voi, ns, nf, m_max = _walk_inputs(signals, FS)
    ref, _ = _both(y, f0, voi, ns, nf, FS, m_max)
    fstep = pd._walk_frame_step(FS)
    got = []
    for b in range(y.shape[0]):
        got.append(place_epochs_pallas(
            y[b:b + 1], f0[b:b + 1], voi[b:b + 1],
            ns[b:b + 1].astype(jnp.int32), nf[b:b + 1].astype(jnp.int32),
            fs=FS, m_max=m_max, frame_step=fstep,
            snap_w=pd._snap_win(FS)))
    got = tuple(jnp.concatenate([g[i] for g in got]) for i in range(3))
    _assert_equal(ref, got)


def test_walk_pallas_16k():
    sig = read_wav(WAVS[0])[0]
    sig16 = sig[::3]
    y, f0, voi, ns, nf, m_max = _walk_inputs([sig16, sig16[:16000]], 16000)
    _assert_equal(*_both(y, f0, voi, ns, nf, 16000, m_max))


def test_track_and_place_batch_uses_same_results():
    """The batched production entry equals vmapped track_and_place_one."""
    from magphase_tpu.parallel import analysis_batch as ab

    signals = [read_wav(w)[0] for w in WAVS[:3]]
    _, dev, S, Tmax, m_max, _ = ab._device_signal_batch(
        list(signals), FS, None, fft_len=4096)
    sigs_d, n_sigs_d, n_frames_d = dev
    sigs_f = ab._sigs_f32(sigs_d)
    ref = jax.vmap(functools.partial(
        pd.track_and_place_one, fs=FS, n_frames_max=Tmax, m_max=m_max))(
        sigs_f, n_sigs_d, n_frames_d)
    got = pd.track_and_place_batch(sigs_f, n_sigs_d, n_frames_d, fs=FS,
                                   n_frames_max=Tmax, m_max=m_max)
    _assert_equal(ref, got)
