#!/usr/bin/env python
"""Contention-immune device timing of the synthesis pipeline.

The shared axon tunnel interleaves other tenants' programs between
dispatches, so wall-clock over many dispatches swings 2-4x.  This tool
wraps K pipeline iterations inside ONE jitted lax.scan that reduces to a
scalar: a single program holds the chip for its whole duration, so
(t(K=hi) - t(K=lo)) / (hi - lo) is pure per-iteration device time, free
of tunnel queueing, dispatch overhead, and the client sync-mode flip.

Usage:  python tools/device_bench.py [fft_len] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRED_DIR = "/root/reference/demos/data_48k/params_predicted"
TOKENS = ["hvd_704", "hvd_705", "hvd_706", "hvd_708"]
FS = 48000


def build_loop_kernel():
    import functools
    import jax
    import jax.numpy as jnp
    from magphase_tpu.parallel import batch as pb

    @functools.partial(
        jax.jit,
        static_argnames=("iters", "fs", "fft_len", "alpha", "alpha_phase",
                         "mag_dim", "phase_dim", "mag_dim_ph",
                         "b_voi_ap_win", "per_phase_type", "out_len_max",
                         "ns_len_max", "b_out_hpf", "pf_type", "hpf_mode"))
    def loop_kernel(feats, voi, pm, shifts, nfrms, ns_len, key, *, iters,
                    **statics):
        def body(acc, k):
            bufs = pb._fused_batch_kernel(
                feats, voi, pm, shifts, nfrms, ns_len,
                jax.random.split(k, feats.shape[0]), **statics)
            return acc + jnp.sum(bufs[:, ::1024]), None

        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    return loop_kernel


def prepare_args(utts, fs, fft_len):
    """Host-side assembly identical to synthesis_from_compressed_batch
    (float16 features, adaptive synthesis FFT derived from fft_len)."""
    import jax
    import jax.numpy as jnp
    from magphase_tpu.config import (define_alpha, define_crossfade_params)
    from magphase_tpu.utils.padding import FRM_STEP, bucket, bucket_signal
    from magphase_tpu.vocoder.compressed import (
        get_num_full_mel_coeffs_from_num_phase_coeffs,
        max_pitch_sync_framelen, synthesis_fft_len)

    fft_len = synthesis_fft_len(fft_len, max(
        max_pitch_sync_framelen(
            (fs / np.where(f0 == 0.0, 200.0, f0)).astype(np.int64))
        for f0 in (np.exp(np.atleast_1d(np.squeeze(np.asarray(
            u[3], np.float64)))) for u in utts)))
    print(f"synthesis fft: {fft_len}", flush=True)
    alpha = define_alpha(fs)
    mag_dim = utts[0][0].shape[1]
    phase_dim = utts[0][1].shape[1]
    mag_dim_ph = get_num_full_mel_coeffs_from_num_phase_coeffs(
        define_crossfade_params(fs)[0], phase_dim, alpha, fs)
    B = len(utts)
    nfrms = np.asarray([np.atleast_1d(np.squeeze(u[3])).shape[0]
                        for u in utts], np.int64)
    F = bucket(int(nfrms.max()), FRM_STEP)
    D = mag_dim + 2 * phase_dim
    feats = np.zeros((B, F, D), np.float16)
    lf0_b = np.full((B, F), -1.0e10)
    for b, (mag, real, imag, lf0) in enumerate(utts):
        n = nfrms[b]
        feats[b, :n, :mag_dim] = mag
        feats[b, :n, mag_dim:mag_dim + phase_dim] = real
        feats[b, :n, mag_dim + phase_dim:] = imag
        lf0_b[b, :n] = np.squeeze(np.asarray(lf0, np.float64))
    v_f0 = np.exp(lf0_b)
    voi_b = v_f0 > 1.0
    shifts_b = (fs / np.where(v_f0 == 0.0, 200.0, v_f0)).astype(np.int64)
    pm_b = np.cumsum(shifts_b, axis=1)
    rows = np.arange(B)
    last = pm_b[rows, nfrms - 1]
    prev = pm_b[rows, np.maximum(nfrms - 2, 0)]
    ns_lens = last + (last - prev)
    out_lens = (ns_lens + 1).tolist()
    O = bucket_signal(int(max(out_lens)))
    NS = bucket_signal(int(ns_lens.max()))
    args = (jnp.asarray(feats), jnp.asarray(voi_b.astype(np.float32)),
            jnp.asarray(pm_b.astype(np.int32)),
            jnp.asarray(shifts_b.astype(np.int32)),
            jnp.asarray(nfrms.astype(np.int32)),
            jnp.asarray(ns_lens.astype(np.int32)))
    statics = dict(fs=fs, fft_len=fft_len, alpha=alpha, alpha_phase=alpha,
                   mag_dim=mag_dim, phase_dim=phase_dim,
                   mag_dim_ph=mag_dim_ph, b_voi_ap_win=True,
                   per_phase_type="magphase", out_len_max=O, ns_len_max=NS,
                   b_out_hpf=True, pf_type="no",
                   hpf_mode=os.environ.get("MAGPHASE_HPF_MODE",
                                           "spectral"))
    audio_s = float(sum(out_lens)) / fs
    return args, statics, audio_s


def bench_analysis_phases(batch=24):
    """Device time of the two analysis phases, via scan loops."""
    import functools
    import glob
    import jax
    import jax.numpy as jnp
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab
    from magphase_tpu.utils.padding import bucket, FRM_STEP
    from magphase_tpu.config import (define_alpha, define_crossfade_params,
                                     define_fft_len)
    from magphase_tpu.vocoder.compressed import \
        get_num_full_mel_coeffs_from_num_phase_coeffs

    fs = FS
    wavs = sorted(glob.glob(
        "/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    batch_sigs = [signals[i % len(signals)] for i in range(batch)]
    audio_s = sum(len(s) for s in batch_sigs) / fs
    fft_len = define_fft_len(fs)

    groups = ab._split_for_budget(batch_sigs, fs, fft_len, None)
    print(f"B={batch} ({audio_s:.1f} audio-s) -> {len(groups)} group(s)",
          flush=True)
    group = groups[0]
    g_audio = sum(len(s) for s in group) / fs
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, fs, None, fft_len=fft_len)
    sigs_d, n_sigs_d, n_frames_d = dev

    @functools.partial(jax.jit, static_argnames=("iters", "fs",
                                                 "n_frames_max", "m_max"))
    def loop_p1(sigs, n_sigs, n_frames, *, iters, fs, n_frames_max, m_max):
        def body(acc, i):
            # vary one sample per iteration: defeats loop-invariant
            # hoisting without changing the workload
            marks, flags, n_marks = ab._track_place_kernel.__wrapped__(
                sigs.at[0, 0].set(i.astype(sigs.dtype)), n_sigs, n_frames,
                fs=fs, n_frames_max=n_frames_max, m_max=m_max)
            return acc + jnp.sum(n_marks) + jnp.sum(marks[:, ::128]), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return acc

    times = {}
    for iters in (1, 9, 1, 9):
        t0 = time.perf_counter()
        v = int(jax.device_get(loop_p1(
            sigs_d, n_sigs_d, n_frames_d, iters=iters, fs=fs,
            n_frames_max=Tmax, m_max=m_max)))
        times.setdefault(iters, []).append(time.perf_counter() - t0)
    p1 = (min(times[9]) - min(times[1])) / 8.0
    print(f"phase1 (track+place): {p1*1e3:.1f} ms "
          f"-> {g_audio/p1:.1f} audio-s/s", flush=True)

    # realised marks for phase 2
    marks, flags, n_marks = ab._track_place_kernel(
        sigs_d, n_sigs_d, n_frames_d, fs=fs, n_frames_max=Tmax,
        m_max=m_max)
    nm = np.asarray(jax.device_get(n_marks))
    Fa = min(m_max, ab.bucket_frames(int(nm.max())))
    alpha = define_alpha(fs)
    mag_dim_ph = get_num_full_mel_coeffs_from_num_phase_coeffs(
        define_crossfade_params(fs)[0], 45, alpha, fs)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_p2(sigs, marks, flags, n_marks, n_sigs, *, iters):
        def body(acc, i):
            mml, mrm, mim, lf0, shift, n_valid = \
                ab._analyze_compress_kernel.__wrapped__(
                    sigs.at[0, 0].set(i.astype(sigs.dtype)), marks, flags,
                    n_marks, n_sigs, fs=fs, fft_len=fft_len, F=Fa, mag_dim=60,
                    phase_dim=45, mag_dim_ph=mag_dim_ph, alpha=alpha,
                    alpha_phase=alpha, fc_max=0)
            return acc + jnp.sum(mml[:, ::64, 0]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    times = {}
    for iters in (1, 9, 1, 9):
        t0 = time.perf_counter()
        v = float(jax.device_get(loop_p2(
            sigs_d, marks, flags, n_marks, n_sigs_d, iters=iters)))
        times.setdefault(iters, []).append(time.perf_counter() - t0)
    p2 = (min(times[9]) - min(times[1])) / 8.0
    print(f"phase2 (analyse+compress, F={Fa}): {p2*1e3:.1f} ms "
          f"-> {g_audio/p2:.1f} audio-s/s", flush=True)
    print(f"per-group total {1e3*(p1+p2):.1f} ms -> "
          f"{g_audio/(p1+p2):.1f} audio-s/s device", flush=True)
    return g_audio / (p1 + p2)


def bench_phase2_breakdown(batch=24):
    """Stage-wise device time of the analyse+compress phase:
    framing (Pallas) -> rfft -> lossless feats -> mel compression."""
    import functools
    import glob
    import jax
    import jax.numpy as jnp
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab
    from magphase_tpu.core import framing, matfft
    from magphase_tpu.core.windows import HANNING
    from magphase_tpu.config import (define_alpha, define_crossfade_params,
                                     define_fft_len)
    from magphase_tpu.vocoder.compressed import \
        get_num_full_mel_coeffs_from_num_phase_coeffs

    fs = FS
    wavs = sorted(glob.glob(
        "/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    batch_sigs = [signals[i % len(signals)] for i in range(batch)]
    fft_len = define_fft_len(fs)
    group = ab._split_for_budget(batch_sigs, fs, fft_len, None)[0]
    g_audio = sum(len(s) for s in group) / fs
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, fs, None, fft_len=fft_len)
    sigs_d, n_sigs_d, n_frames_d = dev
    marks, flags, n_marks = ab._track_place_kernel(
        sigs_d, n_sigs_d, n_frames_d, fs=fs, n_frames_max=Tmax,
        m_max=m_max)
    nm = np.asarray(jax.device_get(n_marks))
    Fa = min(m_max, ab.bucket_frames(int(nm.max())))
    alpha = define_alpha(fs)
    mag_dim_ph = get_num_full_mel_coeffs_from_num_phase_coeffs(
        define_crossfade_params(fs)[0], 45, alpha, fs)

    def staged(sigs, marks_, flags_, n_marks_, n_sigs, upto):
        sigs = ab._sigs_f32(sigs)
        marks_ = marks_[:, :Fa]
        flags_ = flags_[:, :Fa]
        frames, L, R, valid = framing.pitch_sync_frames_batch(
            sigs, marks_, n_marks_, n_sigs, fft_len, win_family=HANNING)
        # NOTE probes must be plain full reductions: strided 3-D slices
        # of the big (B, F, h) intermediates inside this scan reproducibly
        # crash the TPU worker on this backend
        if upto == 0:
            return jnp.sum(jnp.abs(frames))
        # production forward-DFT path (direct_high by default) so the
        # '+rfft' stage attributes time to the kernel the pipeline runs
        rfft_mode = ab._compressed_rfft_mode()
        if rfft_mode == "direct_high":
            spec = matfft.rfft_direct(frames, precision="high")
        elif rfft_mode == "direct_bf16":
            spec = matfft.rfft_noise_grade(frames)
        else:
            spec = jnp.fft.rfft(frames)
        if upto == 1:
            return jnp.sum(jnp.abs(spec.real)) + jnp.sum(jnp.abs(spec.imag))
        m_mag = jnp.abs(spec)
        m_div = jnp.where(m_mag == 0.0, 1.0, m_mag)
        m_real = jnp.where(m_mag == 0.0, 0.0, spec.real / m_div)
        m_imag = jnp.where(m_mag == 0.0, 0.0, spec.imag / m_div)
        v_shift = L
        v_f0 = jnp.where(valid & (v_shift > 0),
                         flags_ * fs / jnp.maximum(v_shift, 1).astype(
                             m_mag.dtype), 0.0)
        if upto == 2:
            return (jnp.sum(jnp.abs(m_mag)) +
                    jnp.sum(jnp.abs(m_real)) + jnp.sum(v_f0))
        mml, mrm, mim, lf0 = ab._compress_streams(
            m_mag, m_real, m_imag, v_f0, mag_dim=60, phase_dim=45,
            mag_dim_ph=mag_dim_ph, alpha=alpha, alpha_phase=alpha)
        return (jnp.sum(jnp.abs(mml)) + jnp.sum(jnp.abs(mrm)) +
                jnp.sum(jnp.abs(lf0)))

    names = ["framing", "+rfft", "+lossless feats", "+compress"]
    prev = 0.0
    for upto in range(4):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(sigs, marks_, flags_, n_marks_, n_sigs, *, iters,
                 _upto=upto):
            def body(acc, i):
                v = staged(sigs.at[0, 0].set(i.astype(sigs.dtype)),
                           marks_, flags_, n_marks_, n_sigs, _upto)
                return acc + v.astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc

        times = {}
        for iters in (1, 9, 1, 9):
            t0 = time.perf_counter()
            v = float(jax.device_get(loop(
                sigs_d, marks, flags, n_marks, n_sigs_d, iters=iters)))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        assert np.isfinite(v)
        t = (min(times[9]) - min(times[1])) / 8.0
        print(f"a{upto} {names[upto]:16s}: {t*1e3:7.2f} ms "
              f"(delta {1e3*(t-prev):+7.2f} ms)  F={Fa}", flush=True)
        prev = t


def bench_phase1_breakdown(batch=24):
    """Split phase-1 device time into track (preprocess+NCCF+Viterbi)
    vs the epoch walk, by timing _track_batch_kernel (no walk) and
    _track_place_kernel (track + walk) with the same scan-loop method."""
    import functools
    import glob
    import jax
    import jax.numpy as jnp
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab
    from magphase_tpu.config import define_fft_len

    fs = FS
    wavs = sorted(glob.glob(
        "/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    batch_sigs = [signals[i % len(signals)] for i in range(batch)]
    group = ab._split_for_budget(batch_sigs, fs, define_fft_len(fs),
                                 None)[0]
    g_audio = sum(len(s) for s in group) / fs
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, fs, None, fft_len=define_fft_len(fs))
    sigs_d, n_sigs_d, n_frames_d = dev

    @functools.partial(jax.jit, static_argnames=("iters", "fs",
                                                 "n_frames_max"))
    def loop_track(sigs, n_frames, *, iters, fs, n_frames_max):
        def body(acc, i):
            states, vals, lags, y_snap = ab._track_batch_kernel.__wrapped__(
                sigs.at[0, 0].set(i.astype(sigs.dtype)), n_frames,
                fs=fs, n_frames_max=n_frames_max)
            return acc + jnp.sum(states[:, ::64]) + \
                jnp.sum(y_snap[:, ::4096]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    def timed(fn):
        times = {}
        for iters in (1, 9, 1, 9):
            t0 = time.perf_counter()
            jax.device_get(fn(iters))
            times.setdefault(iters, []).append(time.perf_counter() - t0)
        return (min(times[9]) - min(times[1])) / 8.0

    t_track = timed(lambda it: loop_track(
        sigs_d.astype(jnp.float32), n_frames_d, iters=it, fs=fs,
        n_frames_max=Tmax))
    print(f"track only:   {t_track*1e3:6.1f} ms "
          f"({g_audio/t_track:7.1f} audio-s/s)", flush=True)

    from magphase_tpu.epochs import tracker as trk
    fs_a = trk.analysis_rate(fs)[0]

    def stage_loop(upto):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(sigs, n_frames, *, iters):
            def body(acc, i):
                def one(sig, nf):
                    # probes consume every live output fully so no stage
                    # is partially dead-code-eliminated
                    xa, y_snap = trk._preprocess(
                        sig.at[0].set(i.astype(sig.dtype)), fs=fs)
                    out = jnp.sum(jnp.abs(xa)) + jnp.sum(jnp.abs(y_snap))
                    if upto >= 1:
                        nccf, valid = trk._nccf(xa, nf, n_frames_max=Tmax,
                                                fs_a=fs_a)
                        out = out + jnp.sum(jnp.abs(nccf))
                    if upto >= 2:
                        vals, lags = trk._candidates(nccf)
                        out = out + jnp.sum(jnp.abs(vals)) + \
                            jnp.sum(jnp.abs(lags))
                    if upto >= 3:
                        states = trk._viterbi(vals, lags, valid, fs_a=fs_a)
                        out = out + jnp.sum(states).astype(jnp.float32)
                    return out
                return acc + jnp.sum(jax.vmap(one)(sigs, n_frames)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc
        return loop

    sf = sigs_d.astype(jnp.float32)
    t_pre = timed(lambda it: stage_loop(0)(sf, n_frames_d, iters=it))
    t_nccf = timed(lambda it: stage_loop(1)(sf, n_frames_d, iters=it))
    t_cand = timed(lambda it: stage_loop(2)(sf, n_frames_d, iters=it))
    t_vit = timed(lambda it: stage_loop(3)(sf, n_frames_d, iters=it))
    print(f"  preprocess: {t_pre*1e3:6.1f} ms", flush=True)
    print(f"  nccf:       {(t_nccf-t_pre)*1e3:6.1f} ms", flush=True)
    print(f"  candidates: {(t_cand-t_nccf)*1e3:6.1f} ms", flush=True)
    print(f"  viterbi:    {(t_vit-t_cand)*1e3:6.1f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_full(sigs, n_sigs, n_frames, *, iters):
        def body(acc, i):
            marks, flags, n_marks = ab._track_place_kernel.__wrapped__(
                sigs.at[0, 0].set(i.astype(sigs.dtype)), n_sigs, n_frames,
                fs=fs, n_frames_max=Tmax, m_max=m_max)
            return acc + jnp.sum(n_marks) + jnp.sum(marks[:, ::128]), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(iters))
        return acc

    t_full = timed(lambda it: loop_full(sigs_d, n_sigs_d, n_frames_d,
                                        iters=it))
    print(f"track+walk:   {t_full*1e3:6.1f} ms "
          f"({g_audio/t_full:7.1f} audio-s/s)", flush=True)
    print(f"walk (diff):  {(t_full-t_track)*1e3:6.1f} ms", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "phase1":
        bench_phase1_breakdown(int(sys.argv[2]) if len(sys.argv) > 2
                               else 24)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "phase2":
        bench_phase2_breakdown(int(sys.argv[2]) if len(sys.argv) > 2
                               else 24)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "analysis":
        bench_analysis_phases(int(sys.argv[2]) if len(sys.argv) > 2 else 24)
        return
    fft_len = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    import jax
    from magphase_tpu.io import read_binfile

    utts = []
    for i in range(batch):
        t = TOKENS[i % len(TOKENS)]
        utts.append(
            (read_binfile(os.path.join(PRED_DIR, t + ".mag"), 60),
             read_binfile(os.path.join(PRED_DIR, t + ".real"), 45),
             read_binfile(os.path.join(PRED_DIR, t + ".imag"), 45),
             np.atleast_1d(read_binfile(os.path.join(PRED_DIR,
                                                     t + ".lf0"), 1))))
    args, statics, audio_s = prepare_args(utts, FS, fft_len)
    loop = build_loop_kernel()
    key = jax.random.PRNGKey(0)

    times = {}
    for iters in (2, 18, 2, 18):
        t0 = time.perf_counter()
        v = float(jax.device_get(loop(*args, key, iters=iters, **statics)))
        dt = time.perf_counter() - t0
        times.setdefault(iters, []).append(dt)
        print(f"iters={iters}: {dt:.3f}s (probe {v:.2f})", flush=True)
    per_iter = (min(times[18]) - min(times[2])) / 16.0
    print(f"fft={fft_len} B={batch}: {per_iter*1e3:.1f} ms/iter device "
          f"-> {audio_s/per_iter:.1f} audio-s/s", flush=True)


if __name__ == "__main__":
    main()
