#!/usr/bin/env python
"""Stage-wise device timing of the fused batch synthesis kernel.

Rebuilds _fused_batch_kernel (parallel/batch.py) truncated at successive
stages and times each with the contention-immune scan-loop method; the
deltas attribute the per-iteration device time:

  s0 unwarp matmuls      (mel -> linear spectra)
  s1 + noise gen/framing/rfft
  s2 + spectral assembly (gains, masks, per+ap sum)
  s3 + irfft/roll/anti-ringing
  s4 + OLA scatter
  s5 + 40 Hz high-pass (sosfilt)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FS = 48000


def main():
    import jax
    import jax.numpy as jnp
    from device_bench import prepare_args, PRED_DIR, TOKENS
    from magphase_tpu.io import read_binfile
    from magphase_tpu.core import framing
    from magphase_tpu.core.filters import butter_highpass_sos, sosfilt
    from magphase_tpu.core.spectral import (protected_log, db,
                                            build_mel_curve)
    from magphase_tpu.core.windows import HANNING, VOI_NOISE
    from magphase_tpu.config import define_crossfade_params
    from magphase_tpu.vocoder.compressed import _unwarp_kernel
    from magphase_tpu.vocoder.compressed import crossfade_down_win_np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    utts = []
    for i in range(batch):
        t = TOKENS[i % len(TOKENS)]
        utts.append(
            (read_binfile(os.path.join(PRED_DIR, t + ".mag"), 60),
             read_binfile(os.path.join(PRED_DIR, t + ".real"), 45),
             read_binfile(os.path.join(PRED_DIR, t + ".imag"), 45),
             np.atleast_1d(read_binfile(
                 os.path.join(PRED_DIR, t + ".lf0"), 1))))
    args, st, audio_s = prepare_args(utts, FS, 4096)
    feats, voi_b, pm, shifts, nfrms, ns_len = args
    fs = FS
    fft_len = st["fft_len"]
    mag_dim, phase_dim = st["mag_dim"], st["phase_dim"]
    mag_dim_ph, alpha = st["mag_dim_ph"], st["alpha"]
    out_len_max, ns_len_max = st["out_len_max"], st["ns_len_max"]
    h = fft_len // 2 + 1
    B, F = pm.shape

    def stage_fn(upto):
        def fn(feats, voi_in, pm, shifts, nfrms, ns_len, key):
            feats = feats.astype(jnp.float32)
            mag_mel = feats[..., :mag_dim].reshape(B * F, mag_dim)
            real_mel = feats[..., mag_dim:mag_dim + phase_dim] \
                .reshape(B * F, phase_dim)
            imag_mel = feats[..., mag_dim + phase_dim:] \
                .reshape(B * F, phase_dim)
            m_mag, m_real, m_imag = _unwarp_kernel(
                mag_mel, real_mel, imag_mel, fft_len=fft_len,
                mag_dim_ph=mag_dim_ph, alpha=alpha, alpha_phase=alpha)
            m_mag = m_mag.reshape(B, F, h)
            m_real = m_real.reshape(B, F, h)
            m_imag = m_imag.reshape(B, F, h)
            if upto == 0:
                return jnp.sum(jnp.abs(m_mag)) + jnp.sum(jnp.abs(m_real))
            dtype = m_mag.dtype
            valid = jnp.arange(F)[None, :] < nfrms[:, None]
            voi = voi_in.astype(bool) & valid
            unv = (~voi_in.astype(bool)) & valid
            keys = jax.random.split(key, B)
            from magphase_tpu.vocoder.compressed import _noise_frames_direct
            from magphase_tpu.core import matfft
            m_frm_ns = _noise_frames_direct(
                keys, pm, nfrms, ns_len, fft_len, VOI_NOISE, HANNING, voi,
                dtype)
            m_ns_cmplx = matfft.rfft_noise_grade(m_frm_ns)
            if upto == 1:
                return jnp.sum(jnp.abs(m_ns_cmplx))
            crsf_cf, crsf_bw = define_crossfade_params(fs)
            w_down = jnp.asarray(
                crossfade_down_win_np(crsf_cf, crsf_bw, fs, h), dtype)
            m_ns_mag = jnp.abs(m_ns_cmplx)
            log2 = protected_log(m_ns_mag[..., 1:-1]) ** 2

            def _masked_gain(mask):
                cnt = jnp.maximum(jnp.sum(mask, axis=1), 1) * (h - 2)
                s = jnp.sum(jnp.where(mask[..., None], log2, 0.0),
                            axis=(1, 2))
                return jnp.sqrt(jnp.exp(s / cnt))

            gain_voi = _masked_gain(voi)[:, None]
            gain_unv = _masked_gain(unv)[:, None]
            m_ns_cmplx = m_ns_cmplx / jnp.where(
                voi, gain_voi, jnp.where(unv, gain_unv, 1.0))[..., None]
            m_ap = m_ns_cmplx * m_mag
            v_line_unv = jnp.asarray(
                db(build_mel_curve(alpha, h, amp=3.5) - 3.5, b_inv=True),
                dtype)
            m_ap = jnp.where(unv[..., None],
                             m_ap * v_line_unv[None, None, :], m_ap)
            m_ph = m_real + 1j * m_imag
            m_ph_mag = jnp.abs(m_ph)
            m_ph_mag = jnp.where(m_ph_mag == 0.0, 1.0, m_ph_mag)
            m_per = m_mag * m_ph / m_ph_mag
            v_line_voi = jnp.asarray(db(build_mel_curve(0.6, h, amp=2.0),
                                        b_inv=True), dtype)
            m_per = jnp.where(voi[..., None],
                              m_per * v_line_voi[None, None, :], m_per)
            per_gain = jnp.where(w_down > 0.0, jnp.sqrt(w_down), 0.0)
            ap_gain = jnp.where(w_down < 1.0, jnp.sqrt(1.0 - w_down), 0.0)
            m_per = jnp.where(voi[..., None],
                              m_per * per_gain[None, None, :], 0.0)
            m_ap = jnp.where(voi[..., None],
                             m_ap * ap_gain[None, None, :], m_ap)
            m_syn = m_per + m_ap
            m_syn = m_syn.at[..., 0].set(jnp.abs(m_syn[..., 0]) + 0j)
            m_syn = m_syn.at[..., -1].set(jnp.abs(m_syn[..., -1]) + 0j)
            if upto == 2:
                return jnp.sum(jnp.abs(m_syn))
            alt = (1.0 - 2.0 * (jnp.arange(h) % 2)).astype(dtype)
            m_frm = matfft.irfft_direct(m_syn * alt, n=fft_len,
                                        precision="high")
            m_frm = jax.vmap(framing.apply_anti_ringing)(m_frm, shifts,
                                                         nfrms)
            if upto == 3:
                return jnp.sum(jnp.abs(m_frm))
            bufs = framing.ola_centered_batch(m_frm, pm, nfrms,
                                              out_len_max)
            if upto == 4:
                return jnp.sum(jnp.abs(bufs))
            sos = butter_highpass_sos(4, 40.0, fs)
            bufs = jax.vmap(lambda x: sosfilt(sos, x))(bufs)
            return jnp.sum(jnp.abs(bufs))
        return fn

    prev = 0.0
    names = ["unwarp", "noise+rfft", "assembly", "irfft+ar", "ola", "hpf"]
    for upto in range(6):
        fn = stage_fn(upto)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(feats, voi_in, pm, shifts, nfrms, ns_len, *, iters,
                 _fn=fn):
            def body(acc, i):
                out = _fn(feats, voi_in, pm, shifts, nfrms, ns_len,
                          jax.random.fold_in(jax.random.PRNGKey(0), i))
                return acc + out, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc

        times = {}
        for iters in (2, 10, 2, 10):
            t0 = time.perf_counter()
            jax.device_get(loop(feats, voi_b, pm, shifts, nfrms, ns_len,
                                iters=iters))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        dt = (min(times[10]) - min(times[2])) / 8.0
        print(f"s{upto} +{names[upto]:<11}: {dt*1e3:7.2f} ms "
              f"(delta {1e3*(dt-prev):+7.2f} ms)", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
