"""Fused two-stage matmul DFT as single Pallas kernels (rfft / irfft).

STATUS: EXPERIMENTAL — correct but measured SLOWER than the einsum
formulation it was meant to beat; NOT used by any production path.
Verdict on v5e (32768 rows, scan-loop timed):

    n=2048   pallas 19.8 / 24.4 ms   einsum 9.2 / 8.3   native 10.8 / 14.3
    n=4096   pallas 23.9 / 27.2 ms   einsum 18.3 / 14.4  native 21.5 / 28.6
             (rfft / irfft)

Why it loses: Mosaic lane-pads every (tr, 128, n1) intermediate to a
128-wide minor (8x VMEM bloat at n1=16), which forces tr=16 row tiles
(larger tiles blow the 16 MB VMEM scoped-allocation limit), and at that
size the batched (128 x n1)@(n1 x n1) matmuls run the MXU at ~1%
utilisation.  The hypothesis that the einsum path's HBM round trips
dominate was wrong at these shapes — XLA's own layout pipeline beats
the hand-fused kernel.  Kept as a working, tested reference for a
future toolchain where small-minor layouts stop padding.

The original motivation (still true, see core/matfft.py): the einsum
DFT's runtime does not move between 3-pass and 6-pass MXU precision,
i.e. it is layout/HBM-bound, so a VMEM-resident pipeline looked like
~3x headroom.  This kernel runs the whole pipeline per row-tile inside
VMEM: one HBM read of the spectrum tile, one HBM write of the frame
tile, all transposes and twiddles on registers/VMEM in between.

Factorisation (core/matfft.py docstring): for n = n1*n2, input index
j = j1*n2 + j2, output index k = k2*n1 + k1,

    X[k2*n1+k1] = sum_j2 D2[j2,k2] * TW[k1,j2] * sum_j1 D1[j1,k1] x[j1*n2+j2]

The split is n2 = 128 (the TPU lane width), n1 = n/128: Mosaic supports
vector reshapes/swapaxes only when the minor dim stays 128 (or comes
from such a shape), and 3-D dot_general contracting the LAST axis.  The
in-tile walk is then:

    (tr, n) -> reshape (tr, n1, 128)          [b, j1, j2]   free
            -> swapaxes                        [b, j2, j1]
            -> dot3d(., D1 (n1, n1))           [b, j2, k1]   MXU
            -> * TW^T (128, n1)                twiddle       VPU
            -> swapaxes                        [b, k1, j2]
            -> dot3d(., D2 (128, 128))         [b, k1, k2]   MXU
            -> swapaxes + reshape              [b, k2*n1+k1] = (tr, n)

The irfft never builds the mirrored hermitian tail (a
reverse+negate+concat assembly miscompiles on the axon TPU backend, see
core/matfft.py): the caller zero-pads the w-weighted half spectrum to n
(w = [1,2,...,2,1]/n) and the kernel returns the real part only, which
drops two of the four stage-2 matmuls.

CPU runs use interpret mode (tests); TPU compiles natively.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_N2 = 128                                   # lane width


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tile_rows(n: int) -> int:
    """Row-tile size.  The (tr, 128, n1) intermediates are lane-padded to
    128 minor (8x bloat at n=2048), so each live plane costs
    tr*128*128*4 B regardless of n1 — tr=16 keeps ~8 live planes plus
    the (tr, n) in/out tiles inside the 16 MB VMEM budget."""
    return 16


@functools.lru_cache(maxsize=32)
def _consts_128(n: int, inverse: bool):
    """(D1r, D1i, TWr^T, TWi^T, D2r, D2i) float32 for the n2=128 split."""
    n1 = n // _N2
    sign = 2j if inverse else -2j
    j1 = np.arange(n1)
    D1 = np.exp(sign * np.pi * np.outer(j1, j1) / n1)            # (j1, k1)
    k1 = np.arange(n1)[None, :]
    j2 = np.arange(_N2)[:, None]
    TWT = np.exp(sign * np.pi * j2 * k1 / n)                     # (j2, k1)
    jj2 = np.arange(_N2)
    D2 = np.exp(sign * np.pi * np.outer(jj2, jj2) / _N2)         # (j2, k2)
    f32 = lambda a: np.ascontiguousarray(a).astype(np.float32)
    return (f32(D1.real), f32(D1.imag), f32(TWT.real)[None],
            f32(TWT.imag)[None], f32(D2.real), f32(D2.imag))


def _dot3(a, b):
    """Batched matmul contracting the last axis of a with b's first."""
    return jax.lax.dot_general(a, b, (((2,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=_F32)


def _stage_walk(xr, xi, consts, tr: int, n1: int, real_only: bool):
    """Two matmul stages + twiddle on one (tr, n1*128) VMEM tile.
    xi may be None (real input).  Returns (Cr, Ci) as (tr, n) values in
    k = k2*n1 + k1 order (Ci is None when real_only)."""
    d1r, d1i, twrt, twit, d2r, d2i = consts

    def j2_major(v):                          # (tr, n) -> (tr, j2, j1)
        return jnp.swapaxes(v.reshape(tr, n1, _N2), 1, 2)

    xrT = j2_major(xr)
    if xi is None:
        Ar = _dot3(xrT, d1r)                  # (tr, j2, k1)
        Ai = _dot3(xrT, d1i)
    else:
        xiT = j2_major(xi)
        Ar = _dot3(xrT, d1r) - _dot3(xiT, d1i)
        Ai = _dot3(xrT, d1i) + _dot3(xiT, d1r)
    Br = Ar * twrt - Ai * twit                # twiddle (1, j2, k1)
    Bi = Ar * twit + Ai * twrt

    BrT = jnp.swapaxes(Br, 1, 2)              # (tr, k1, j2)
    BiT = jnp.swapaxes(Bi, 1, 2)
    Cr = _dot3(BrT, d2r) - _dot3(BiT, d2i)    # (tr, k1, k2)
    Ci = None
    if not real_only:
        Ci = _dot3(BrT, d2i) + _dot3(BiT, d2r)

    # output stays 3-D (tr, k2, k1): its row-major linear order IS
    # k = k2*n1 + k1, so the caller's reshape to (tr, n) is free in XLA;
    # merging the (k2, k1) dims in-kernel is an unsupported shape cast
    def k_order(v):                           # (tr, k1, k2) -> (tr, k2, k1)
        return jnp.swapaxes(v, 1, 2)

    return k_order(Cr), (None if Ci is None else k_order(Ci))


def _rfft_kernel(d1r, d1i, twrt, twit, d2r, d2i, x_ref, re_ref, im_ref,
                 *, tr: int, n1: int):
    consts = (d1r[...], d1i[...], twrt[...], twit[...], d2r[...], d2i[...])
    Cr, Ci = _stage_walk(x_ref[...], None, consts, tr, n1,
                         real_only=False)
    re_ref[...] = Cr
    im_ref[...] = Ci


def _irfft_kernel(d1r, d1i, twrt, twit, d2r, d2i, zr_ref, zi_ref, y_ref,
                  *, tr: int, n1: int):
    consts = (d1r[...], d1i[...], twrt[...], twit[...], d2r[...], d2i[...])
    Cr, _ = _stage_walk(zr_ref[...], zi_ref[...], consts, tr, n1,
                        real_only=True)
    y_ref[...] = Cr


def _pad_rows_to(x, tr: int):
    r = x.shape[0]
    rp = -(-r // tr) * tr
    if rp != r:
        x = jnp.pad(x, [(0, rp - r), (0, 0)])
    return x, rp


def _const_specs(consts):
    return [pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM) for c in consts]


@functools.partial(jax.jit, static_argnames=("n",))
def rfft_fused(x: jnp.ndarray, n: int):
    """rfft of real x (..., n), n a power of two >= 256.

    Returns (re, im) float32 arrays of shape (..., n//2+1) — separate
    planes instead of complex64 so no complex constants/buffers are
    involved (axon-unsafe, core/matfft.py)."""
    n1 = n // _N2
    h = n // 2 + 1
    lead = x.shape[:-1]
    x2 = x.reshape(-1, n).astype(_F32)
    r = x2.shape[0]
    tr = _tile_rows(n)
    x2, rp = _pad_rows_to(x2, tr)
    consts = [jnp.asarray(c) for c in _consts_128(n, inverse=False)]

    spec3 = pl.BlockSpec((tr, _N2, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        functools.partial(_rfft_kernel, tr=tr, n1=n1),
        grid=(rp // tr,),
        in_specs=_const_specs(consts) + [
            pl.BlockSpec((tr, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[spec3, spec3],
        out_shape=[jax.ShapeDtypeStruct((rp, _N2, n1), _F32),
                   jax.ShapeDtypeStruct((rp, _N2, n1), _F32)],
        interpret=_use_interpret(),
    )(*consts, x2)
    re = re.reshape(rp, n)[:r, :h]            # row-major (k2, k1) == k
    im = im.reshape(rp, n)[:r, :h]
    return re.reshape(*lead, h), im.reshape(*lead, h)


@functools.partial(jax.jit, static_argnames=("n",))
def irfft_fused(zr: jnp.ndarray, zi: jnp.ndarray, n: int):
    """Inverse rfft from the h = n/2+1 hermitian bins (zr, zi) — real
    float32 output (..., n).  The hermitian mirror is folded into per-bin
    weights + zero-padding (never a reverse; see module docstring)."""
    from magphase_tpu.core.matfft import hermitian_fold_weights
    n1 = n // _N2
    h = n // 2 + 1
    wj = jnp.asarray(hermitian_fold_weights(n))
    lead = zr.shape[:-1]
    zr2 = (zr.reshape(-1, h) * wj).astype(_F32)
    zi2 = (zi.reshape(-1, h) * wj).astype(_F32)
    r = zr2.shape[0]
    pad = [(0, 0), (0, n - h)]
    zr2 = jnp.pad(zr2, pad)
    zi2 = jnp.pad(zi2, pad)
    tr = _tile_rows(n)
    zr2, rp = _pad_rows_to(zr2, tr)
    zi2, _ = _pad_rows_to(zi2, tr)
    consts = [jnp.asarray(c) for c in _consts_128(n, inverse=True)]

    y = pl.pallas_call(
        functools.partial(_irfft_kernel, tr=tr, n1=n1),
        grid=(rp // tr,),
        in_specs=_const_specs(consts) + [
            pl.BlockSpec((tr, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, _N2, n1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, _N2, n1), _F32),
        interpret=_use_interpret(),
    )(*consts, zr2, zi2)
    return y.reshape(rp, n)[:r].reshape(*lead, n)
