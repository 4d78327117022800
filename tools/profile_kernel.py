#!/usr/bin/env python
"""Capture a jax.profiler trace of a production kernel and print the
top HLO ops by self time (xprof hlo_stats), for stage attribution that
doesn't rely on truncated-program deltas.

Usage: python tools/profile_kernel.py {track|phase2|synth} [batch]
"""
import glob
import json
import os
import sys

# must be set before ANY protobuf import (jax pulls protobuf in): the
# image's C++ descriptor pool rejects the profiler plugin's generated pb2s
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 48000
WAV_DIR = "/root/reference/demos/data_48k/wavs_nat"


def capture(which: str, batch: int, logdir: str):
    import jax
    import jax.numpy as jnp
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab
    from magphase_tpu.config import define_fft_len

    signals = [read_wav(w)[0]
               for w in sorted(glob.glob(os.path.join(WAV_DIR, "*.wav")))]
    batch_sigs = [signals[i % len(signals)] for i in range(batch)]
    fft_len = define_fft_len(FS)
    group = ab._split_for_budget(batch_sigs, FS, fft_len, None)[0]
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, FS, None, fft_len=fft_len)
    sigs_d, n_sigs_d, n_frames_d = dev

    if which == "track":
        fn = lambda: ab._track_place_kernel(
            sigs_d, n_sigs_d, n_frames_d, fs=FS, n_frames_max=Tmax,
            m_max=m_max)
    elif which == "phase2":
        from magphase_tpu.config import define_alpha, define_crossfade_params
        from magphase_tpu.vocoder.compressed import \
            get_num_full_mel_coeffs_from_num_phase_coeffs
        marks, flags, n_marks = ab._track_place_kernel(
            sigs_d, n_sigs_d, n_frames_d, fs=FS, n_frames_max=Tmax,
            m_max=m_max)
        nm = np.asarray(jax.device_get(n_marks))
        Fa = min(m_max, ab.bucket_frames(int(nm.max())))
        alpha = define_alpha(FS)
        mdp = get_num_full_mel_coeffs_from_num_phase_coeffs(
            define_crossfade_params(FS)[0], 45, alpha, FS)
        fn = lambda: ab._analyze_compress_kernel(
            sigs_d, marks, flags, n_marks, n_sigs_d, fs=FS,
            fft_len=fft_len, F=Fa, mag_dim=60, phase_dim=45,
            mag_dim_ph=mdp, alpha=alpha, alpha_phase=alpha, fc_max=0)
    elif which == "synth":
        import jax.numpy as jnp
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from device_bench import prepare_args, PRED_DIR, TOKENS
        from magphase_tpu.io import read_binfile
        from magphase_tpu.parallel import batch as pb

        utts = []
        for i in range(max(batch, 128)):
            t = TOKENS[i % len(TOKENS)]
            utts.append(
                (read_binfile(os.path.join(PRED_DIR, t + ".mag"), 60),
                 read_binfile(os.path.join(PRED_DIR, t + ".real"), 45),
                 read_binfile(os.path.join(PRED_DIR, t + ".imag"), 45),
                 np.atleast_1d(read_binfile(
                     os.path.join(PRED_DIR, t + ".lf0"), 1))))
        args, statics, _ = prepare_args(utts, FS, 4096)
        import jax as _jax
        keys = _jax.random.split(_jax.random.PRNGKey(0), args[0].shape[0])
        fn = lambda: pb._fused_batch_kernel(*args, keys, **statics)
    else:
        raise SystemExit(f"unknown target {which}")

    out = fn()                      # compile + warm
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.device_get(jnp.sum(out[0][0])
                                        if isinstance(out, tuple)
                                        else out)))  # flip to sync mode
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        v = jax.device_get(out[0] if isinstance(out, tuple) else out)
    assert np.all(np.isfinite(np.asarray(v, np.float32)))


def report(logdir: str, top: int = 25):
    # xprof's converter (the tensorboard_plugin_profile one in this image
    # is incompatible with its TF); needs
    # PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    from xprof.convert import raw_to_tool_data as rtd

    runs = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*")))
    assert runs, f"no profile runs under {logdir}"
    run = runs[-1]
    xspaces = glob.glob(os.path.join(run, "*.xplane.pb"))
    assert xspaces, f"no xplane.pb under {run}"
    data, _ = rtd.xspace_to_tool_data(xspaces, "hlo_stats", {})
    obj = json.loads(data) if isinstance(data, (str, bytes)) else data
    # hlo_stats is a gviz table json; print name + self time columns
    cols = [c["label"] for c in obj["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in obj["rows"]]
    try:
        i_name = cols.index("HLO Op Name")
    except ValueError:
        i_name = 2
    cand = [i for i, c in enumerate(cols) if "self" in c.lower()
            and "time" in c.lower() and "%" not in c]
    i_self = cand[0] if cand else 3
    i_cat = cols.index("HLO Op Category") if "HLO Op Category" in cols \
        else None
    rows.sort(key=lambda r: -(r[i_self] or 0.0))
    print(f"{'self us':>12s}  {'category':22s} op")
    for r in rows[:top]:
        cat = (r[i_cat] or "")[:22] if i_cat is not None else ""
        print(f"{r[i_self] or 0.0:12.1f}  {cat:22s} {str(r[i_name])[:90]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "track"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    logdir = f"/tmp/xprof_{which}"
    os.system(f"rm -rf {logdir}")
    capture(which, batch, logdir)
    report(logdir)


if __name__ == "__main__":
    main()
