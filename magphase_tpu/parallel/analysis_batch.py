"""Batched corpus analysis: epoch tracking + lossless analysis +
mel-compression for many utterances in fused device calls.

Replaces the reference's Pool-parallel batch_feature_extraction_for_tts.py
(one process + one REAPER + three SPTK subprocesses per utterance) with:
device-batched NCCF/Viterbi tracking, a host O(n_marks) epoch walk per
utterance, then batched analysis + compression kernels, all shardable over
the 'data' mesh axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import define_alpha, define_crossfade_params, define_fft_len
from ..epochs import tracker
from ..utils.padding import FRM_STEP, SIG_STEP, bucket, pad_to
from ..vocoder.compressed import (
    _format_kernel, get_num_full_mel_coeffs_from_num_phase_coeffs)
from ..vocoder.lossless import _analysis_kernel
from .mesh import shard_batch


@functools.partial(jax.jit, static_argnames=("fs", "n_pad", "n_frames_max"))
def _track_batch_kernel(sigs, n_frames, *, fs: int, n_pad: int,
                        n_frames_max: int):
    """vmapped preprocess + NCCF + candidates + Viterbi."""
    def one(sig, nf):
        xa, y_snap = tracker._preprocess(sig, fs=fs, n_pad=n_pad)
        nccf, valid = tracker._nccf(xa, nf, n_frames_max=n_frames_max)
        vals, lags = tracker._candidates(nccf)
        states = tracker._viterbi(vals, lags, valid)
        return states, vals, lags, y_snap

    return jax.vmap(one)(sigs, n_frames)


def track_f0_batch(signals: list, fs: int):
    """Batched F0 tracks.  Returns list of (f0, voiced, y_snap)."""
    B = len(signals)
    S = bucket(max(len(s) for s in signals), SIG_STEP)
    sigs = np.stack([pad_to(np.asarray(s, np.float32), S) for s in signals])

    fs_a = tracker.FS_ANALYSIS
    step = int(round(tracker.FRAME_STEP_S * fs_a))
    w = int(round(tracker.CORR_WIN_S * fs_a))
    max_lag = int(round(fs_a / tracker.F0_MIN))
    n_frames = np.asarray(
        [max(1, ((len(s) * fs_a) // fs - (w + max_lag)) // step + 1)
         for s in signals], np.int32)
    Tmax = bucket(int(n_frames.max()), 128)

    states, vals, lags, y_snap = _track_batch_kernel(
        jnp.asarray(sigs), jnp.asarray(n_frames), fs=fs, n_pad=S,
        n_frames_max=Tmax)
    states = np.asarray(jax.device_get(states))
    lags = np.asarray(jax.device_get(lags))
    y_snap = np.asarray(jax.device_get(y_snap))

    out = []
    for b in range(B):
        nf = int(n_frames[b])
        st = states[b, :nf]
        voiced = st < tracker.N_CAND
        lag_sel = np.where(
            voiced, lags[b, np.arange(nf),
                         np.clip(st, 0, tracker.N_CAND - 1)], 0.0)
        f0 = np.where(voiced & (lag_sel > 0),
                      fs_a / np.maximum(lag_sel, 1.0), 0.0)
        out.append((f0, voiced, y_snap[b, :len(signals[b])]))
    return out


@functools.partial(jax.jit, static_argnames=("fft_len", "fs"))
def _analysis_batch_jit(sigs, pm, nfrms, n_sig, voi, *, fft_len: int,
                        fs: int):
    # module-level jit: a per-call jax.jit(partial(...)) would recompile
    # on every invocation (the partial is a fresh callable each time)
    from ..vocoder.lossless import analysis_core_batch
    return analysis_core_batch(sigs, pm, nfrms, n_sig, voi,
                               fft_len=fft_len, fs=fs)


def analysis_lossless_batch(signals: list, fs: int,
                            fft_len: int | None = None,
                            epochs: list | None = None,
                            mesh=None):
    """Batched lossless analysis.  Returns list of
    (m_mag, m_real, m_imag, v_f0, v_shift) float32/int numpy tuples.

    ``epochs``: optional list of (pm_sec, voi) overriding the tracker.
    ``mesh``: optional 1-D data mesh; the batch axis is sharded over it.
    """
    if fft_len is None:
        fft_len = define_fft_len(fs)
    B = len(signals)

    if epochs is None:
        tracks = track_f0_batch(signals, fs)
        epochs = []
        for sig, (f0, voiced, y_snap) in zip(signals, tracks):
            epochs.append(tracker.place_epochs(sig, fs, f0, voiced, y_snap))

    pms = [np.asarray(np.round(np.asarray(p) * fs), np.int64)
           for p, _ in epochs]
    vois = [np.asarray(v, np.float64) for _, v in epochs]
    nfrms = [len(p) for p in pms]

    S = bucket(max(len(s) for s in signals), SIG_STEP)
    F = bucket(max(nfrms), FRM_STEP)
    sigs_d = jnp.asarray(np.stack(
        [pad_to(np.asarray(s, np.float32), S) for s in signals]))
    pm_d = jnp.asarray(np.stack(
        [pad_to(p.astype(np.int32), F) for p in pms]))
    voi_d = jnp.asarray(np.stack(
        [pad_to(v.astype(np.float32), F) for v in vois]))
    nfrms_d = jnp.asarray(np.asarray(nfrms, np.int32))
    nsig_d = jnp.asarray(np.asarray([len(s) for s in signals], np.int32))

    if mesh is not None:
        sigs_d, pm_d, nfrms_d, nsig_d, voi_d = shard_batch(
            mesh, sigs_d, pm_d, nfrms_d, nsig_d, voi_d)

    mag, real, imag, _f0, shift = _analysis_batch_jit(
        sigs_d, pm_d, nfrms_d, nsig_d, voi_d, fft_len=fft_len, fs=fs)
    mag, real, imag, shift = jax.device_get((mag, real, imag, shift))

    out = []
    for b in range(B):
        n = nfrms[b]
        sh = shift[b, :n].astype(np.int64)
        f0 = vois[b][:n] * fs / sh.astype(np.float64)
        out.append((mag[b, :n], real[b, :n], imag[b, :n], f0, sh))
    return out


def analysis_compressed_batch(signals: list, fs: int, mag_dim: int = 60,
                              phase_dim: int = 45,
                              fft_len: int | None = None,
                              epochs: list | None = None,
                              alpha_phase: float | None = None):
    """Batched compressed analysis.  Returns list of
    (mag_mel_log, real_mel, imag_mel, lf0, shift)."""
    from scipy import signal as sp_signal
    alpha = define_alpha(fs)
    if alpha_phase is None:
        alpha_phase = alpha
    mag_dim_ph = get_num_full_mel_coeffs_from_num_phase_coeffs(
        define_crossfade_params(fs)[0], phase_dim, alpha_phase, fs)

    lossless = analysis_lossless_batch(signals, fs, fft_len=fft_len,
                                       epochs=epochs)
    B = len(lossless)
    nfrms = [t[0].shape[0] for t in lossless]
    F = bucket(max(nfrms), FRM_STEP)
    h = lossless[0][0].shape[1]

    mag_b = np.zeros((B, F, h), np.float32)
    real_b = np.zeros((B, F, h), np.float32)
    imag_b = np.zeros((B, F, h), np.float32)
    voi_b = np.zeros((B, F), np.float32)
    for b, (mag, real, imag, f0, sh) in enumerate(lossless):
        n = nfrms[b]
        mag_b[b, :n] = mag
        real_b[b, :n] = real
        imag_b[b, :n] = imag
        voi_b[b, :n] = (f0 > 0)

    # compression is frame-independent -> flatten
    mml, mrm, mim = _format_kernel(
        jnp.asarray(mag_b.reshape(B * F, h)),
        jnp.asarray(real_b.reshape(B * F, h)),
        jnp.asarray(imag_b.reshape(B * F, h)),
        jnp.asarray(voi_b.reshape(B * F)),
        mag_dim=mag_dim, phase_dim=phase_dim, mag_dim_ph=mag_dim_ph,
        alpha=alpha, alpha_phase=alpha_phase)
    mml = np.asarray(mml).reshape(B, F, mag_dim)
    mrm = np.asarray(mrm).reshape(B, F, phase_dim)
    mim = np.asarray(mim).reshape(B, F, phase_dim)

    out = []
    for b, (mag, real, imag, f0, sh) in enumerate(lossless):
        n = nfrms[b]
        v_voi = (f0 > 0).astype(np.float64)
        v_f0_s = v_voi * sp_signal.medfilt(np.asarray(f0, np.float64))
        with np.errstate(divide="ignore"):
            lf0 = np.log(np.maximum(v_f0_s, 0))
        lf0[~np.isfinite(lf0)] = -1.0e10
        out.append((mml[b, :n].astype(np.float64),
                    mrm[b, :n].astype(np.float64),
                    mim[b, :n].astype(np.float64), lf0, sh))
    return out
