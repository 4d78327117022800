#!/usr/bin/env python
"""Diagnose TPU walk mismatches: pallas vs XLA-while walk vs host walk.

Usage: walk_diag.py dump OUT.npz   (on TPU: saves both device walks' marks)
       walk_diag.py ref OUT.npz    (on CPU: saves the XLA walk as reference)
       walk_diag.py cmp A.npz B.npz
"""
import functools
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 48000


def _inputs():
    import jax
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab
    from magphase_tpu.epochs import placement_device as pd
    from magphase_tpu.config import define_fft_len

    wavs = sorted(glob.glob("/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    batch = [signals[i % len(signals)] for i in range(24)]
    group = ab._split_for_budget(batch, FS, define_fft_len(FS), None)[0]
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, FS, None, fft_len=define_fft_len(FS))
    sigs_d, n_sigs_d, n_frames_d = dev
    sigs_f = ab._sigs_f32(sigs_d)

    @jax.jit
    def track(sigs, n_frames):
        return jax.vmap(functools.partial(
            pd._track_one, fs=FS, n_frames_max=Tmax))(sigs, n_frames)

    y_snap, f0, voi = track(sigs_f, n_frames_d)
    return y_snap, f0, voi, n_sigs_d, n_frames_d, m_max


def dump_fused(path):
    """Compare the production fused track+place kernel with the Pallas
    walk vs the XLA walk (toggled via MAGPHASE_DISABLE_PALLAS, read at
    trace time)."""
    import jax
    from magphase_tpu.io import read_wav
    from magphase_tpu.parallel import analysis_batch as ab
    from magphase_tpu.config import define_fft_len

    wavs = sorted(glob.glob("/root/reference/demos/data_48k/wavs_nat/*.wav"))
    signals = [read_wav(w)[0] for w in wavs]
    batch = [signals[i % len(signals)] for i in range(24)]
    group = ab._split_for_budget(batch, FS, define_fft_len(FS), None)[0]
    _, dev, S, Tmax, m_max, n_real = ab._device_signal_batch(
        group, FS, None, fft_len=define_fft_len(FS))
    sigs_d, n_sigs_d, n_frames_d = dev
    out = {}
    for mode in ("pallas", "xla"):
        if mode == "xla":
            os.environ["MAGPHASE_DISABLE_PALLAS"] = "1"
        else:
            os.environ.pop("MAGPHASE_DISABLE_PALLAS", None)
        # the env flag is read at trace time: force a retrace
        ab._track_place_kernel.clear_cache()
        r = ab._track_place_kernel(sigs_d, n_sigs_d, n_frames_d, fs=FS,
                                   n_frames_max=Tmax, m_max=m_max)
        marks, flags, nm = (np.asarray(jax.device_get(x)) for x in r)
        out[f"{mode}_marks"] = marks
        out[f"{mode}_flags"] = flags
        out[f"{mode}_nm"] = nm
    np.savez(path, **out)
    print("saved fused", path)


def dump(path, modes):
    import jax
    import jax.numpy as jnp
    from magphase_tpu.epochs import placement_device as pd

    y, f0, voi, ns, nf, m_max = _inputs()
    fstep = pd._walk_frame_step(FS)
    out = {}
    for mode in modes:
        if mode == "pallas":
            from magphase_tpu.pallas_kernels.walk_pallas import \
                place_epochs_pallas
            r = jax.jit(functools.partial(
                place_epochs_pallas, fs=FS, m_max=m_max, frame_step=fstep,
                snap_w=pd._snap_win(FS)))(
                y, f0, voi, ns.astype(jnp.int32), nf.astype(jnp.int32))
        else:
            walk = functools.partial(pd.place_epochs_kernel, fs=FS,
                                     m_max=m_max, frame_step=fstep)
            r = jax.jit(jax.vmap(walk))(y, f0, voi, ns, nf)
        marks, flags, nm = (np.asarray(jax.device_get(x)) for x in r)
        out[f"{mode}_marks"] = marks
        out[f"{mode}_flags"] = flags
        out[f"{mode}_nm"] = nm
    np.savez(path, **out)
    print("saved", path, "modes", modes)


def cmp_arrays(a, b, tag):
    nm_a, nm_b = a[2], b[2]
    if not np.array_equal(nm_a, nm_b):
        d = np.nonzero(nm_a != nm_b)[0]
        print(f"{tag}: n_marks differs at utts {d[:8]}: "
              f"{nm_a[d[:8]]} vs {nm_b[d[:8]]}")
    diffs = 0
    for b_i in range(a[0].shape[0]):
        n = min(nm_a[b_i], nm_b[b_i])
        d = np.nonzero(a[0][b_i, :n] != b[0][b_i, :n])[0]
        if len(d):
            diffs += len(d)
            print(f"{tag}: utt {b_i}: {len(d)} mark diffs, first at "
                  f"{d[0]}: {a[0][b_i, d[0]]} vs {b[0][b_i, d[0]]} "
                  f"(delta {int(b[0][b_i, d[0]]) - int(a[0][b_i, d[0]])})")
    fd = np.nonzero(a[1] != b[1])
    print(f"{tag}: total mark diffs {diffs}, flag diffs {len(fd[0])}, "
          f"n_marks equal: {np.array_equal(nm_a, nm_b)}")


def main():
    cmd = sys.argv[1]
    if cmd == "dump":
        dump(sys.argv[2], ["pallas", "xla"])
    elif cmd == "fused":
        dump_fused(sys.argv[2])
    elif cmd == "ref":
        # force CPU: the env pins JAX_PLATFORMS=axon; only jax.config
        # overrides it (tests/conftest.py)
        import jax
        jax.config.update("jax_platforms", "cpu")
        dump(sys.argv[2], ["pallas", "xla"])
    elif cmd == "cmp":
        A = np.load(sys.argv[2])
        B = np.load(sys.argv[3])
        for ka in ("pallas", "xla"):
            for kb in ("pallas", "xla"):
                if f"{ka}_marks" in A and f"{kb}_marks" in B and \
                        (sys.argv[2] != sys.argv[3] or ka < kb):
                    cmp_arrays(
                        (A[f"{ka}_marks"], A[f"{ka}_flags"], A[f"{ka}_nm"]),
                        (B[f"{kb}_marks"], B[f"{kb}_flags"], B[f"{kb}_nm"]),
                        f"{ka}(A) vs {kb}(B)")


if __name__ == "__main__":
    main()
