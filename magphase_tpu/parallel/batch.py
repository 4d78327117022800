"""Corpus-scale batched vocoding, sharded over the ``data`` mesh axis.

This replaces the reference's multiprocessing.Pool fan-out
(libutils.py:32-63, scripts/batch_waveform_generation.py:58): utterances are
padded into dense (B, frames, ...) tensors, every kernel is vmapped over the
batch axis, and the batch axis is sharded over devices — one jit, zero
cross-device communication inside the pipeline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import define_alpha, define_crossfade_params, define_fft_len
from ..core.filters import butter_highpass_sos, sosfilt
from ..utils.padding import FRM_STEP, SIG_STEP, bucket, pad_to
from ..vocoder import framerate
from ..vocoder.compressed import (
    _unwarp_kernel, get_num_full_mel_coeffs_from_num_phase_coeffs,
    synthesis_core_batch)
from ..vocoder.postfilter import post_filter
from .mesh import batch_sharding, data_mesh, shard_batch


@functools.partial(
    jax.jit,
    static_argnames=("fs", "fft_len", "alpha", "b_voi_ap_win",
                     "per_phase_type", "out_len_max", "ns_len_max",
                     "b_out_hpf"))
def _batch_synthesis_core(m_mag, m_real, m_imag, v_voi, pm, shifts, nfrms,
                          ns_len, keys, *, fs, fft_len, alpha, b_voi_ap_win,
                          per_phase_type, out_len_max, ns_len_max,
                          b_out_hpf):
    """Batched synthesis core (Pallas framing/OLA on TPU), plus the output
    high-pass as a cascaded-biquad scan (magphase.py:990-995)."""
    bufs = synthesis_core_batch(
        m_mag, m_real, m_imag, v_voi, pm, shifts, nfrms, ns_len, keys,
        fs=fs, fft_len=fft_len, alpha=alpha, b_voi_ap_win=b_voi_ap_win,
        per_phase_type=per_phase_type, out_len_max=out_len_max,
        ns_len_max=ns_len_max)
    if b_out_hpf:
        sos = butter_highpass_sos(4, 40.0, fs)
        bufs = jax.vmap(lambda x: sosfilt(sos, x))(bufs)
    return bufs


def synthesis_from_compressed_batch(utts, fs: int,
                                    fft_len: int | None = None,
                                    b_voi_ap_win: bool = True,
                                    per_phase_type: str = "magphase",
                                    alpha_phase: float | None = None,
                                    b_out_hpf: bool = True,
                                    pf_type: str = "no",
                                    key=None, mesh=None,
                                    block_result: bool = True):
    """Batch synthesis from compressed features.

    utts: list of (m_mag_mel_log, m_real_mel, m_imag_mel, v_lf0) numpy
    tuples.  Returns list of float64 waveforms (or device buffers + lengths
    when ``block_result`` is False, for benchmarking).
    """
    alpha = define_alpha(fs)
    if fft_len is None:
        fft_len = define_fft_len(fs)
    if alpha_phase is None:
        alpha_phase = alpha
    if key is None:
        key = jax.random.PRNGKey(0)

    B = len(utts)
    mag_dim = utts[0][0].shape[1]
    phase_dim = np.atleast_2d(utts[0][1]).shape[1]
    mag_dim_ph = get_num_full_mel_coeffs_from_num_phase_coeffs(
        define_crossfade_params(fs)[0], phase_dim, alpha_phase, fs)

    # host-side per-utterance framing math (float64 parity)
    frames_n, pms, shifts_i, vois, ns_lens, out_lens = [], [], [], [], [], []
    for (mag, real, imag, lf0) in utts:
        v_f0 = np.exp(np.asarray(lf0, np.float64))
        v_voi = v_f0 > 1.0
        v_shift = framerate.f0_to_shift_np(v_f0, fs).astype(np.int64)
        v_pm = np.cumsum(v_shift)
        frames_n.append(len(v_shift))
        pms.append(v_pm)
        shifts_i.append(v_shift)
        vois.append(v_voi)
        ns_lens.append(int(v_pm[-1] + (v_pm[-1] - v_pm[-2])))
        out_lens.append(int(v_pm[-1] + (v_pm[-1] - v_pm[-2]) + 1))

    F = bucket(max(frames_n), FRM_STEP)
    O = bucket(max(out_lens), SIG_STEP)
    NS = bucket(max(ns_lens), SIG_STEP)

    def stack(seq, n, dtype):
        return np.stack([pad_to(np.asarray(s, dtype), n) for s in seq])

    mag_in = stack([u[0] for u in utts], F, np.float32)
    real_in = stack([np.atleast_2d(u[1]) for u in utts], F, np.float32)
    imag_in = stack([np.atleast_2d(u[2]) for u in utts], F, np.float32)

    if pf_type in ("magphase", "merlin"):
        # both post-filters are per-frame maps, so flattening (B,F,d) ->
        # (B*F,d) is exact (padding rows are filtered too, then ignored)
        from ..vocoder.postfilter import post_filter_merlin
        bf, fr, dd = mag_in.shape
        flat = jnp.asarray(mag_in.reshape(bf * fr, dd))
        if pf_type == "magphase":
            flat = post_filter(flat, fs)
        else:
            flat = post_filter_merlin(flat, fs)
        mag_in = np.asarray(flat).reshape(bf, fr, dd)

    # unwarp is frame-independent: flatten (B, F, d) -> (B*F, d)
    m_mag_d, m_real_d, m_imag_d = _unwarp_kernel(
        jnp.asarray(mag_in.reshape(B * F, -1)),
        jnp.asarray(real_in.reshape(B * F, -1)),
        jnp.asarray(imag_in.reshape(B * F, -1)),
        fft_len=fft_len, mag_dim_ph=mag_dim_ph, alpha=alpha,
        alpha_phase=alpha_phase)
    h = fft_len // 2 + 1
    m_mag_b = m_mag_d.reshape(B, F, h)
    m_real_b = m_real_d.reshape(B, F, h)
    m_imag_b = m_imag_d.reshape(B, F, h)

    voi_b = jnp.asarray(stack(vois, F, np.float32))
    pm_b = jnp.asarray(stack(pms, F, np.int32))
    shift_b = jnp.asarray(stack(shifts_i, F, np.int32))
    nfrms_b = jnp.asarray(np.asarray(frames_n, np.int32))
    ns_len_b = jnp.asarray(np.asarray(ns_lens, np.int32))
    keys = jax.random.split(key, B)

    if mesh is not None:
        (m_mag_b, m_real_b, m_imag_b, voi_b, pm_b, shift_b, nfrms_b,
         ns_len_b, keys) = shard_batch(
            mesh, m_mag_b, m_real_b, m_imag_b, voi_b, pm_b, shift_b,
            nfrms_b, ns_len_b, keys)

    bufs = _batch_synthesis_core(
        m_mag_b, m_real_b, m_imag_b, voi_b, pm_b, shift_b, nfrms_b,
        ns_len_b, keys, fs=fs, fft_len=fft_len, alpha=alpha,
        b_voi_ap_win=b_voi_ap_win, per_phase_type=per_phase_type,
        out_len_max=O, ns_len_max=NS, b_out_hpf=b_out_hpf)

    if not block_result:
        return bufs, out_lens
    bufs = jax.device_get(bufs)
    return [np.asarray(bufs[i][:out_lens[i]], np.float64) for i in range(B)]
