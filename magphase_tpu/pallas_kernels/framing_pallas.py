"""Pallas TPU kernels for pitch-synchronous framing and overlap-add.

XLA lowers the ragged frame gather (core/framing.py) to an element-wise
gather (~80M elem/s on v5e — 760 ms for a 20-utterance batch) because the
per-frame rotation makes indices arbitrary.  But each rotated frame is just
TWO contiguous slices of the signal:

    rotated[p] = sig[left_lim + ((p+L) mod N)]
               = sigx[off + pm + p]          for p <  N - L   (slice A)
               = sigx[off + pm + p - N]      for p >= N - L   (slice B)

(off = N padding; left_lim + L == pm).  Mosaic requires lane-dimension
slice starts to be 128-aligned, so each frame does ONE aligned load of a
2N+128 window followed by a dynamic lane rotation (tpu.dynamic_rotate via
pltpu.roll) — VPU bandwidth instead of scalar gather.  OLA similarly
becomes an aligned read-modify-write of an N+128 window with the frame
rotated into lane position.

Both kernels run a (B, F/TILE_F) grid; the signal/output block is
revisited across the frame dimension so it stays VMEM-resident for a whole
utterance (~0.5-0.6 MB per utterance at 48 kHz).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import windows as WIN

TILE_F = 8
LANE = 128


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _half_profile(t, fam: int):
    if fam == 0:      # hanning
        return 0.5 - 0.5 * jnp.cos(jnp.pi * t)
    if fam == 1:      # bartlett^2.5 (voi_noise)
        return jnp.power(jnp.clip(t, 0.0, 1.0), 2.5)
    if fam == 2:      # boxcar
        return jnp.ones_like(t)
    raise ValueError(fam)


# ---------------------------------------------------------------------------
# frames kernel

def _frames_kernel(pm_ref, L_ref, R_ref, voi_ref, nfrms_ref, sig_ref,
                   out_ref, rot_ref, *, fft_len: int, fam_voiced: int,
                   fam_unvoiced: int):
    b = pl.program_id(0)
    ft = pl.program_id(1)
    N = fft_len

    p1 = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    # pass 1 — per-frame aligned loads + lane rotations into a
    # (TILE_F, N) scratch.  tpu.dynamic_rotate only handles power-of-two
    # lane widths, so the A/B slices each use their own 2N-wide aligned
    # window + roll.
    for j in range(TILE_F):
        f = ft * TILE_F + j
        pm = pm_ref[b, f]
        L = L_ref[b, f]
        start_a = (N + LANE) + pm             # slice-A start in sigx
        base_a = pl.multiple_of((start_a // LANE) * LANE, LANE)
        base_b = pl.multiple_of(base_a - N, LANE)
        r = start_a % LANE
        Wa = pltpu.roll(sig_ref[0, :, pl.ds(base_a, 2 * N)], -r, 1)
        Wb = pltpu.roll(sig_ref[0, :, pl.ds(base_b, 2 * N)], -r, 1)
        # Wa[p] = sigx[start_a + p];  Wb[p] = sigx[start_a - N + p]
        rot_ref[j, :] = jnp.where(p1 < N - L, Wa[:, :N], Wb[:, :N])[0]

    # pass 2 — window computation vectorised over the whole (TILE_F, N)
    # tile: the transcendental-heavy profile math runs at full sublane
    # occupancy instead of 1/8 on (1, N) slices
    def col(ref):
        return jnp.stack([ref[b, ft * TILE_F + j]
                          for j in range(TILE_F)]).reshape(TILE_F, 1)

    L2 = col(L_ref)
    R2 = col(R_ref).astype(jnp.float32)
    fidx = jax.lax.broadcasted_iota(jnp.int32, (TILE_F, 1), 0) \
        + ft * TILE_F
    valid = fidx < nfrms_ref[b]

    p = jax.lax.broadcasted_iota(jnp.int32, (TILE_F, N), 1)
    q = jnp.where(p < N - L2, p + L2, p + L2 - N).astype(jnp.float32)
    Lf = L2.astype(jnp.float32)
    t_left = jnp.where(Lf > 0, q / jnp.maximum(Lf, 1.0), 1.0)
    t_right = jnp.where(R2 > 0, (Lf + R2 - q) / jnp.maximum(R2, 1.0), 1.0)
    t = jnp.where(q <= Lf, t_left, t_right)

    if fam_voiced == fam_unvoiced:
        win = _half_profile(t, fam_voiced)
    else:
        is_voi = col(voi_ref) > 0
        win = jnp.where(is_voi, _half_profile(t, fam_voiced),
                        _half_profile(t, fam_unvoiced))

    in_frame = (q < (Lf + R2 + 1.0)) & valid
    out_ref[0, :, :] = jnp.where(in_frame, rot_ref[...] * win, 0.0)


def _chunked_over_batch(call, b_max: int, *arrays):
    """Run ``call`` (a function of same-leading-B arrays) over batch chunks
    of at most ``b_max`` rows via lax.map.

    Scalar-prefetch operands live whole in SMEM (1 MB on v5e), so a
    (B, F) geometry tensor must stay bounded regardless of batch size;
    chunking the batch keeps each pallas_call's SMEM footprint constant.
    Padding rows carry nfrms=0 (all arrays zero-padded), which both
    kernels treat as fully invalid.
    """
    B = arrays[0].shape[0]
    if B <= b_max:
        return call(*arrays)
    n_chunks = -(-B // b_max)
    Bp = n_chunks * b_max

    def padr(a):
        pad = Bp - a.shape[0]
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape((n_chunks, b_max) + a.shape[1:])

    out = jax.lax.map(lambda xs: call(*xs), tuple(padr(a) for a in arrays))
    return out.reshape((Bp,) + out.shape[2:])[:B]


@functools.partial(jax.jit, static_argnames=("fft_len", "fam_voiced",
                                             "fam_unvoiced"))
def frames_pallas(sigx, pm, L, R, voi, nfrms, *, fft_len: int,
                  fam_voiced: int = 0, fam_unvoiced: int = 0):
    """Windowed delay-compensated frames.

    sigx: (B, fft_len+128 + S + 2*fft_len) zero-padded layout (build with
    ``pad_signal``).  pm/L/R: (B, F) int32; voi: (B, F) float32;
    nfrms: (B,) int32.  Returns (B, F, fft_len) float32.
    """
    B, F = pm.shape
    # 4 (b, F) scalar-prefetch operands x 4 bytes each; keep under ~512 KB
    b_max = max(1, (1 << 15) // F)
    return _chunked_over_batch(
        functools.partial(_frames_pallas_call, fft_len=fft_len,
                          fam_voiced=fam_voiced, fam_unvoiced=fam_unvoiced),
        b_max, sigx, pm, L, R, voi, nfrms)


def _frames_pallas_call(sigx, pm, L, R, voi, nfrms, *, fft_len: int,
                        fam_voiced: int, fam_unvoiced: int):
    B, F = pm.shape
    assert F % TILE_F == 0
    Sx = sigx.shape[1]
    assert Sx % LANE == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, F // TILE_F),
        in_specs=[
            # (1, 1, Sx) block: singleton second-to-last dim satisfies the
            # Mosaic (8, 128) block-tiling rule while keeping one
            # utterance's signal VMEM-resident across the frame grid dim
            pl.BlockSpec((1, 1, Sx), lambda b, ft, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_F, fft_len),
                               lambda b, ft, *_: (b, ft, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE_F, fft_len), jnp.float32)],
    )
    kern = functools.partial(_frames_kernel, fft_len=fft_len,
                             fam_voiced=fam_voiced,
                             fam_unvoiced=fam_unvoiced)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, F, fft_len), jnp.float32),
        interpret=_use_interpret(),
    )(pm, L, R, voi, nfrms, sigx[:, None, :])


def pad_signal(sig_batch: np.ndarray, fft_len: int) -> np.ndarray:
    """(B, S) -> (B, fft_len+128 + S + 2*fft_len) zero-padded layout
    expected by frames_pallas (front pad fft_len+128 so base_a - N >= 0,
    tail pad 2*fft_len so the 2N windows stay in bounds)."""
    B, S = sig_batch.shape
    front = fft_len + LANE
    out = np.zeros((B, front + S + 2 * fft_len), sig_batch.dtype)
    out[:, front:front + S] = sig_batch
    return out


# ---------------------------------------------------------------------------
# OLA kernel

def _ola_body(start_ref, nfrms_ref, wl_ref, wr_ref, frm_ref, out_ref,
              *, fft_len: int, anti_ring: bool):
    b = pl.program_id(0)
    ft = pl.program_id(1)
    N = fft_len

    @pl.when(ft == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    zpad = jnp.zeros((1, N), jnp.float32)
    for j in range(TILE_F):
        f = ft * TILE_F + j

        @pl.when(f < nfrms_ref[b])
        def _():
            s = start_ref[b, f]
            base = pl.multiple_of((s // LANE) * LANE, LANE)
            r = s % LANE
            v = frm_ref[:, j, :]
            if anti_ring:
                # anti-ringing window fused into the scatter
                # (magphase.py:968-973); measured slower than a separate
                # batched windowing pass, see ola_pallas docstring
                p = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
                v = v * WIN.centr_win_value(
                    p, wl_ref[b, f], wr_ref[b, f], N, WIN.RAISED_HANNING,
                    att=1.0, fill_bound=True)
            # 2N-wide (power-of-two) window: frame rolled into lane
            # position r, zeros elsewhere (the zero pad wraps around)
            fp = jnp.concatenate([v, zpad], axis=1)
            fr = pltpu.roll(fp, r, 1)         # fr[i] = fp[i - r]
            W = out_ref[0, :, pl.ds(base, 2 * N)]
            out_ref[0, :, pl.ds(base, 2 * N)] = W + fr


def _ola_kernel(start_ref, nfrms_ref, frm_ref, out_ref, *, fft_len: int):
    _ola_body(start_ref, nfrms_ref, None, None, frm_ref, out_ref,
              fft_len=fft_len, anti_ring=False)


def _ola_ar_kernel(start_ref, nfrms_ref, wl_ref, wr_ref, frm_ref, out_ref,
                   *, fft_len: int):
    _ola_body(start_ref, nfrms_ref, wl_ref, wr_ref, frm_ref, out_ref,
              fft_len=fft_len, anti_ring=True)


@functools.partial(jax.jit,
                   static_argnames=("fft_len", "out_len_pad", "anti_ring"))
def ola_pallas(frames, starts, nfrms, wl=None, wr=None, *, fft_len: int,
               out_len_pad: int, anti_ring: bool = False):
    """Overlap-add: frame f of utterance b added at starts[b, f].

    starts must be >= 0 and <= out_len_pad - 2*fft_len.  With
    ``anti_ring``, each frame is multiplied in-kernel by the centred
    raised-hanning window of lengths (wl[b, f], wr[b, f]) before the
    scatter (magphase.py:968-973 fused into the OLA).
    Returns (B, out_len_pad) float32.
    """
    B, F, N = frames.shape
    if anti_ring:
        # four (b, F) scalar-prefetch operands; keep under ~512 KB SMEM
        b_max = max(1, (1 << 16) // F)
        return _chunked_over_batch(
            functools.partial(_ola_pallas_call, fft_len=fft_len,
                              out_len_pad=out_len_pad, anti_ring=True),
            b_max, frames, starts, nfrms, wl, wr)
    # default path: two prefetch operands only (no dead wl/wr traffic)
    b_max = max(1, (1 << 17) // F)
    return _chunked_over_batch(
        functools.partial(_ola_pallas_call, fft_len=fft_len,
                          out_len_pad=out_len_pad, anti_ring=False),
        b_max, frames, starts, nfrms)


def _ola_pallas_call(frames, starts, nfrms, wl=None, wr=None, *,
                     fft_len: int, out_len_pad: int, anti_ring: bool):
    B, F, N = frames.shape
    assert F % TILE_F == 0
    assert out_len_pad % LANE == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 if anti_ring else 2,
        grid=(B, F // TILE_F),
        in_specs=[
            pl.BlockSpec((1, TILE_F, N), lambda b, ft, *_: (b, ft, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, out_len_pad),
                               lambda b, ft, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    if anti_ring:
        kern = functools.partial(_ola_ar_kernel, fft_len=fft_len)
        args = (starts, nfrms, wl, wr, frames)
    else:
        kern = functools.partial(_ola_kernel, fft_len=fft_len)
        args = (starts, nfrms, frames)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, out_len_pad), jnp.float32),
        interpret=_use_interpret(),
    )(*args)
    return out[:, 0, :]
