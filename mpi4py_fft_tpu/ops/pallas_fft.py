"""Pallas TPU kernel: fused two-stage planar FFT along the last axis.

The jnp engine (ops/matfft.py) expresses an N = N1*N2 transform as two
MXU einsum stages with a twiddle in between; for arrays larger than VMEM,
XLA materializes every intermediate in HBM, so one 1-D transform costs
~6 HBM passes.  This kernel processes a tile of batch rows entirely in
VMEM — load once, run stage-1 matmuls, twiddle, stage-2 matmuls, permute,
store once — cutting HBM traffic to the 2 unavoidable passes.

Layout/shape contract:
  input  p: (2, B, N) real (planar complex, batch-flattened, N last)
  output   : (2, B, N)
  N = N1 * N2 with N1, N2 <= 128 (one fused level; larger N falls back to
  the jnp engine which recurses).

Per-tile algorithm (planar arithmetic, all on the MXU/VPU):
  x[b, n1*N2 + n2]  --view-->  x[b, n1, n2]
  a[k1, b*n2] = sum_n1 W1[k1, n1] x[b, n1, n2]          (stage-1 matmuls)
  t[k1, b, n2] = a * tw[k1, n2]                          (twiddle, VPU)
  c[k1*b, k2] = sum_n2 t[k1, b, n2] W2[n2, k2]           (stage-2 matmuls)
  X[b, k2*N1 + k1] = c[k1, b, k2]                        (VMEM permute)
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matfft import _dft_matrix, _twiddle, _factorize, _prec as _mat_prec


def _prec(dtype):
    # Mosaic dot lowering supports DEFAULT/HIGHEST only; map HIGH up.
    p = _mat_prec(dtype)
    return lax.Precision.HIGHEST if p == lax.Precision.HIGH else p

__all__ = ['fft2stage_p', 'supported_length']

_MAX_RADIX = 128


def supported_length(N):
    """True if the fused kernel handles length N (N = N1*N2, each <= 128)."""
    fs = _factorize(N)
    if len(fs) == 2 and all(f <= _MAX_RADIX for f in fs):
        return True
    if len(fs) == 1 and fs[0] <= _MAX_RADIX:
        return False  # single matmul — jnp engine is already one pass
    return False


def _kernel(x_ref, w1_ref, tw_ref, w2_ref, o_ref, *, N1, N2, prec):
    """One batch tile: full fused transform in VMEM.

    Mosaic-friendly formulation: every relayout is either a metadata-free
    C-order reshape or a swap of the last two dims (sublane/lane
    transpose), and every contraction a 2-D matmul on the MXU.
    """
    Bt = x_ref.shape[1]

    def dot(a, b):
        return jnp.dot(a, b, precision=prec,
                       preferred_element_type=a.dtype)

    # planar inputs; W1[n1, k1], W2[n2, k2] symmetric DFT matrices
    xr = x_ref[0].reshape(Bt, N1, N2)     # x[b, n1, n2] (free)
    xi = x_ref[1].reshape(Bt, N1, N2)
    w1r, w1i = w1_ref[0], w1_ref[1]
    w2r, w2i = w2_ref[0], w2_ref[1]
    twr = tw_ref[0]                       # tw[k1, n2]
    twi = tw_ref[1]

    # stage 1: contract n1 -> a[b, n2, k1]
    xtr = jnp.swapaxes(xr, -1, -2).reshape(Bt * N2, N1)   # x[b, n2, n1]
    xti = jnp.swapaxes(xi, -1, -2).reshape(Bt * N2, N1)
    ar = dot(xtr, w1r) - dot(xti, w1i)                    # (Bt*N2, k1)
    ai = dot(xtr, w1i) + dot(xti, w1r)

    # twiddle (k1, n2) applied in (n2, k1) orientation
    twTr = jnp.swapaxes(twr, -1, -2)[None]                # (1, N2, N1)
    twTi = jnp.swapaxes(twi, -1, -2)[None]
    a3r = ar.reshape(Bt, N2, N1)
    a3i = ai.reshape(Bt, N2, N1)
    t3r = a3r * twTr - a3i * twTi
    t3i = a3r * twTi + a3i * twTr

    # stage 2: contract n2 -> c[b, k1, k2]
    t2r = jnp.swapaxes(t3r, -1, -2).reshape(Bt * N1, N2)  # t[b, k1, n2]
    t2i = jnp.swapaxes(t3i, -1, -2).reshape(Bt * N1, N2)
    cr = dot(t2r, w2r) - dot(t2i, w2i)                    # (Bt*N1, k2)
    ci = dot(t2r, w2i) + dot(t2i, w2r)

    # X[b, k2*N1 + k1] = c[b, k1, k2] -> swap last two dims, flatten
    o_ref[0] = jnp.swapaxes(cr.reshape(Bt, N1, N2), -1, -2).reshape(Bt, N1 * N2)
    o_ref[1] = jnp.swapaxes(ci.reshape(Bt, N1, N2), -1, -2).reshape(Bt, N1 * N2)


def _pick_tile(B, N, itemsize):
    """Batch tile size: keep ~<= 6 MB of live VMEM (x, a, t, c planar)."""
    budget = 6 * 1024 * 1024
    per_row = 2 * N * itemsize * 4      # ~4 live planar row copies
    bt = max(8, min(B, budget // max(per_row, 1)))
    # multiple of 8 (f32 sublane); also make it divide B if possible
    bt = max(8, (bt // 8) * 8)
    while B % bt and bt > 8:
        bt -= 8
    return bt if B % bt == 0 else B  # fall back to one tile


@functools.partial(jax.jit, static_argnames=('sign', 'interpret'))
def _call(p, w1, tw, w2, sign, interpret=False):
    _, B, N = p.shape
    N1 = w1.shape[-1]
    N2 = w2.shape[-1]
    Bt = _pick_tile(B, N, p.dtype.itemsize)
    grid = (B // Bt,)
    kern = functools.partial(_kernel, N1=N1, N2=N2, prec=_prec(p.dtype))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, Bt, N), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N1, N1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N1, N2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N2, N2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, Bt, N), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p, w1, tw, w2)


def fft2stage_p(p, sign, interpret=False):
    """Fused planar FFT along the last axis of (2, ..., N).

    Requires ``supported_length(N)``.  sign=-1 forward, +1 unscaled inverse.
    """
    shape = p.shape
    N = shape[-1]
    if jax.default_backend() != 'tpu':
        interpret = True        # pallas TPU kernels interpret elsewhere
    N1, N2 = _factorize(N)
    dtype_str = np.dtype(p.dtype).name
    # W1[k1, n1] (the _dft_matrix is symmetric), W2[n2, k2], tw[k1, n2]
    w1 = jnp.asarray(_dft_matrix(N1, sign, dtype_str))
    w2 = jnp.asarray(_dft_matrix(N2, sign, dtype_str))
    tw = jnp.asarray(_twiddle(N1, N2, sign, dtype_str))
    B = int(np.prod(shape[1:-1])) if len(shape) > 2 else 1
    p2 = p.reshape(2, B, N)
    y = _call(p2, w1, tw, w2, sign, interpret=interpret)
    return y.reshape(shape)
