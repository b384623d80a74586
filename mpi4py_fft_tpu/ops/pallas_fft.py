"""Pallas TPU kernel: fused two-stage planar FFT along the last axis.

The jnp engine (ops/matfft.py) expresses an N-point transform as matmul
stages with twiddles in between; for arrays larger than VMEM, XLA
materializes every intermediate in HBM, so one 1-D transform costs ~6 HBM
passes.  This kernel runs the whole transform for a tile of batch rows in
one VMEM residency — load once, stage-1 radix combine, twiddle, stage-2
MXU matmul, output permute, store once — i.e. the 2 unavoidable HBM passes.

Decomposition: N = S * 128 with n = n1*128 + n2 (n1 < S slow, n2 < 128
lane-minor) and output X[k2*S + k1]:

    a[b, k1, n2] = sum_n1 W_S[k1, n1] x[b, n1, n2]     (stage 1)
    t[b, k1, n2] = a * exp(sign*2i*pi*k1*n2/N)          (twiddle)
    c[b, k1, k2] = sum_n2 t[b, k1, n2] W_128[n2, k2]    (stage 2)
    X[b, k2*S + k1] = c[b, k1, k2]

Mosaic-legality (probed on the target toolchain): the only relayouts used
are lane-preserving reshapes ((B,N)<->(B,S,128), (B,S,128)<->(B*S,128)),
last-two-dim swaps, and leading-dim transposes; stage 1 is an unrolled
VPU multiply-add over the S slices (S <= 8), stage 2 a (B*S,128)@(128,128)
MXU dot — the shape the systolic array is built for.  The final
(k2, k1)-major block leaves the kernel as (B, 128, S) and is flattened to
(B, N) by a metadata-only XLA reshape.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matfft import _dft_matrix, _twiddle, _prec as _mat_prec
from .pallas_butterfly import _bspec

__all__ = ['fft2stage_p', 'supported_length']

_LANE = 128
_MAX_S = 8


def _prec(dtype):
    # Mosaic dot lowering supports DEFAULT/HIGHEST only; map HIGH up.
    p = _mat_prec(dtype)
    return lax.Precision.HIGHEST if p == lax.Precision.HIGH else p


def supported_length(N):
    """True if the fused kernel handles length N (N = S*128, S <= 8)."""
    return N % _LANE == 0 and 1 <= N // _LANE <= _MAX_S


def _kernel(x_ref, tw_ref, w2_ref, o_ref, *, S, W1, prec):
    """One batch tile entirely in VMEM.

    x_ref: (2, Bt, S, 128);  o_ref: (2, Bt, 128, S).
    W1 (2, S, S) entries are baked in as static python scalars;
    tw_ref holds the planar twiddle (2, S, 128), w2_ref the planar
    (2, 128, 128) DFT matrix.
    """
    Bt = x_ref.shape[1]
    xr = x_ref[0]                          # (Bt, S, 128)
    xi = x_ref[1]
    w2r, w2i = w2_ref[0], w2_ref[1]        # (128, 128)

    # stage 1 + twiddle, unrolled over k1: VPU multiply-adds on (Bt, 128)
    t_r = []
    t_i = []
    for k1 in range(S):
        ar = None
        ai = None
        for n1 in range(S):
            wr = float(W1[0, k1, n1])
            wi = float(W1[1, k1, n1])
            xr_s = xr[:, n1, :]
            xi_s = xi[:, n1, :]
            pr = wr * xr_s - wi * xi_s
            pi = wr * xi_s + wi * xr_s
            ar = pr if ar is None else ar + pr
            ai = pi if ai is None else ai + pi
        twr = tw_ref[0, k1, :]                              # (128,)
        twi = tw_ref[1, k1, :]
        t_r.append(ar * twr[None, :] - ai * twi[None, :])
        t_i.append(ar * twi[None, :] + ai * twr[None, :])
    tr = jnp.stack(t_r, axis=1)            # (Bt, S, 128) = t[b, k1, n2]
    ti = jnp.stack(t_i, axis=1)

    # stage 2: (Bt*S, 128) @ (128, 128) on the MXU
    tr2 = tr.reshape(Bt * S, _LANE)
    ti2 = ti.reshape(Bt * S, _LANE)

    def dot(a, b):
        return jnp.dot(a, b, precision=prec, preferred_element_type=a.dtype)

    cr = dot(tr2, w2r) - dot(ti2, w2i)     # (Bt*S, 128) = c[b, k1, k2]
    ci = dot(tr2, w2i) + dot(ti2, w2r)

    # emit c[b, k1, k2] in block layout; the host-side wrapper applies
    # the X[b, k2*S + k1] ordering with one XLA transpose (a lane-minor
    # S output block here would tile-pad VMEM by 128/S and OOM)
    o_ref[0] = cr.reshape(Bt, S, _LANE)
    o_ref[1] = ci.reshape(Bt, S, _LANE)


import os as _os

_VMEM_BUDGET = int(_os.environ.get('MPI4PY_FFT_TPU_PALLAS_VMEM_KB',
                                   '1024')) * 1024


def _pick_tile(B, N, itemsize):
    """Batch tile bounded by the VMEM budget.  Each batch row occupies a
    full (8, 128) sublane tile per planar part regardless of S (<= 8), and
    ~6 padded copies are live (double-buffered in/out + temps); the Mosaic
    scoped-vmem limit on this generation is 16 MB."""
    per_row = 2 * 8 * _LANE * itemsize * 6
    bt = max(8, min(B, _VMEM_BUDGET // max(per_row, 1)))
    bt = max(8, (bt // 8) * 8)
    while B % bt and bt > 8:
        bt -= 8
    return bt if B % bt == 0 else B


@functools.partial(jax.jit, static_argnames=('sign', 'interpret'))
def _call(p, w2, sign, interpret=False):
    _, B, N = p.shape
    S = N // _LANE
    dtype_str = np.dtype(p.dtype).name
    W1 = _dft_matrix(S, sign, dtype_str)           # numpy, static
    tw = jnp.asarray(_twiddle(S, _LANE, sign, dtype_str))
    Bt = _pick_tile(B, N, p.dtype.itemsize)
    grid = (B // Bt,)
    kern = functools.partial(_kernel, S=S, W1=W1, prec=_prec(p.dtype))
    x4 = p.reshape(2, B, S, _LANE)                 # metadata-only
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, B, S, _LANE), p.dtype),
        grid=grid,
        in_specs=[
            _bspec((2, Bt, S, _LANE), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            _bspec((2, S, _LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _bspec((2, _LANE, _LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_bspec((2, Bt, S, _LANE), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4, tw, w2)
    # X[b, k2*S + k1] = c[b, k1, k2]: one XLA transpose + free reshape
    return jnp.swapaxes(out, -1, -2).reshape(2, B, N)


def fft2stage_p(p, sign, interpret=False):
    """Fused planar FFT along the last axis of (2, ..., N).

    Requires ``supported_length(N)``.  sign=-1 forward, +1 unscaled inverse.
    """
    shape = p.shape
    N = shape[-1]
    if jax.default_backend() != 'tpu':
        interpret = True        # pallas TPU kernels interpret elsewhere
    dtype_str = np.dtype(p.dtype).name
    w2 = jnp.asarray(_dft_matrix(_LANE, sign, dtype_str))
    B = int(np.prod(shape[1:-1])) if len(shape) > 2 else 1
    p2 = p.reshape(2, B, N)
    y = _call(p2, w2, sign, interpret=interpret)
    return y.reshape(shape)
