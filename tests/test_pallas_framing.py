"""Pallas framing/OLA kernels vs the XLA reference implementations
(interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from magphase_tpu.core import framing
from magphase_tpu.core.windows import HANNING, VOI_NOISE
from magphase_tpu.pallas_kernels.framing_pallas import (frames_pallas,
                                                        ola_pallas)


def _setup(B=2, F=64, N=512, S=8192, seed=0):
    rng = np.random.RandomState(seed)
    sig = rng.randn(B, S).astype(np.float32)
    pm = np.cumsum(rng.randint(60, 120, (B, F)), axis=1).astype(np.int32)
    nfrms = np.asarray([F - 10, F - 3], np.int32)
    return sig, pm, nfrms


def _geometry(pm, nfrms, n_sig):
    B, F = pm.shape
    Ls, Rs = np.zeros((B, F), np.int32), np.zeros((B, F), np.int32)
    for b in range(B):
        L, R, _ = _one_geom(pm[b], nfrms[b], n_sig)
        Ls[b], Rs[b] = L, R
    return Ls, Rs


def _one_geom(pm, nf, n_sig):
    F = len(pm)
    L = np.zeros(F, np.int32)
    R = np.zeros(F, np.int32)
    for f in range(F):
        if f >= nf:
            continue
        prev = pm[f - 1] if f > 0 else 0
        nxt = pm[f + 1] if f < nf - 1 else n_sig - 1
        L[f] = pm[f] - prev
        R[f] = nxt - pm[f]
    return L, R, None


def test_frames_pallas_matches_xla():
    B, F, N, S = 2, 64, 512, 8192
    sig, pm, nfrms = _setup(B, F, N, S)
    n_sig = S - 100

    ref = []
    for b in range(B):
        fr, _, _, _ = framing.pitch_sync_frames(
            jnp.asarray(sig[b]), jnp.asarray(pm[b]), jnp.int32(nfrms[b]),
            jnp.int32(n_sig), N, HANNING)
        ref.append(np.asarray(fr))
    ref = np.stack(ref)

    L, R = _geometry(pm, nfrms, n_sig)
    from magphase_tpu.pallas_kernels.framing_pallas import pad_signal
    sigx = pad_signal(sig, N)
    got = np.asarray(frames_pallas(
        jnp.asarray(sigx), jnp.asarray(pm), jnp.asarray(L), jnp.asarray(R),
        jnp.zeros((B, F), jnp.float32), jnp.asarray(nfrms), fft_len=N))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_frames_pallas_voiced_window_select():
    B, F, N, S = 2, 64, 512, 8192
    sig, pm, nfrms = _setup(B, F, N, S)
    n_sig = S - 100
    voi = (np.arange(F) % 2 == 0).astype(np.float32)[None, :].repeat(B, 0)

    ref = []
    for b in range(B):
        fr, _, _, _ = framing.pitch_sync_frames(
            jnp.asarray(sig[b]), jnp.asarray(pm[b]), jnp.int32(nfrms[b]),
            jnp.int32(n_sig), N, VOI_NOISE,
            voiced=jnp.asarray(voi[b] > 0), win_family_unvoiced=HANNING)
        ref.append(np.asarray(fr))
    ref = np.stack(ref)

    L, R = _geometry(pm, nfrms, n_sig)
    from magphase_tpu.pallas_kernels.framing_pallas import pad_signal
    sigx = pad_signal(sig, N)
    got = np.asarray(frames_pallas(
        jnp.asarray(sigx), jnp.asarray(pm), jnp.asarray(L), jnp.asarray(R),
        jnp.asarray(voi), jnp.asarray(nfrms), fft_len=N,
        fam_voiced=1, fam_unvoiced=0))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ola_pallas_matches_xla():
    B, F, N = 2, 64, 512
    rng = np.random.RandomState(1)
    frames = rng.randn(B, F, N).astype(np.float32)
    pm = np.cumsum(rng.randint(60, 120, (B, F)), axis=1).astype(np.int32)
    nfrms = np.asarray([F - 5, F - 1], np.int32)
    out_len = 16384

    ref = []
    for b in range(B):
        r = framing.ola_centered(jnp.asarray(frames[b]), jnp.asarray(pm[b]),
                                 jnp.int32(nfrms[b]), out_len)
        ref.append(np.asarray(r))
    ref = np.stack(ref)

    starts = pm - N // 2 + N   # same +fft_len offset as ola_centered
    got = np.asarray(ola_pallas(jnp.asarray(frames), jnp.asarray(starts),
                                jnp.asarray(nfrms), fft_len=N,
                                out_len_pad=out_len + 4 * N))
    got = got[:, N:N + out_len]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_ola_pallas_fused_anti_ringing_matches_two_pass():
    """In-kernel anti-ringing (ola_pallas(anti_ring=True)) must equal the
    two-pass apply_anti_ringing -> OLA form (magphase.py:968-976)."""
    B, F, N = 2, 64, 512
    rng = np.random.RandomState(3)
    frames = rng.randn(B, F, N).astype(np.float32)
    shifts = rng.randint(60, 120, (B, F)).astype(np.int32)
    pm = np.cumsum(shifts, axis=1).astype(np.int32)
    nfrms = np.asarray([F - 5, F - 1], np.int32)
    out_len = 16384

    windowed = np.asarray(jax.vmap(framing.apply_anti_ringing)(
        jnp.asarray(frames), jnp.asarray(shifts), jnp.asarray(nfrms)))
    starts = pm - N // 2 + N
    ref = np.asarray(ola_pallas(jnp.asarray(windowed), jnp.asarray(starts),
                                jnp.asarray(nfrms), fft_len=N,
                                out_len_pad=out_len + 4 * N))

    wl, wr = jax.vmap(framing.ar_winlens)(jnp.asarray(shifts),
                                          jnp.asarray(nfrms))
    got = np.asarray(ola_pallas(jnp.asarray(frames), jnp.asarray(starts),
                                jnp.asarray(nfrms),
                                wl.astype(jnp.int32), wr.astype(jnp.int32),
                                fft_len=N, out_len_pad=out_len + 4 * N,
                                anti_ring=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_apply_anti_ringing_matches_generic_centr_win():
    """The specialised anti-ringing pass (per-frame fill scalar instead
    of the generic per-element fill_bound re-evaluation) must be
    BITWISE identical to the generic windows.centr_win_value form it
    replaced (core/framing.py:apply_anti_ringing)."""
    import jax.numpy as jnp
    from magphase_tpu.core import framing, windows as W

    rng = np.random.RandomState(5)
    F, fft_len = 24, 256
    frames = jnp.asarray(rng.randn(F, fft_len).astype(np.float32))
    shifts = jnp.asarray(rng.randint(20, 90, F).astype(np.int32))
    # include degenerate rows: zero shifts (padding) and tiny nfrms
    shifts = shifts.at[-2:].set(0)
    for nfrms in (F, F - 4, 1):
        got = framing.apply_anti_ringing(frames, shifts,
                                         jnp.int32(nfrms))
        wl, wr = framing.ar_winlens(shifts, jnp.int32(nfrms))
        win = W.centr_win_value(jnp.arange(fft_len)[None, :],
                                wl[:, None], wr[:, None], fft_len,
                                W.RAISED_HANNING, att=1.0,
                                fill_bound=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(frames * win))
