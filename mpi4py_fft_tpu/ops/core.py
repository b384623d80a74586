"""Pure-JAX serial transform math (FFTW conventions, unnormalized).

This is the TPU-native compute core replacing the reference's native FFTW
engine (reference: mpi4py_fft/fftw/fftw_planxfftn.c:10-77 and
fftw_xfftn.pyx:109-296).  Design notes:

* every function here is *pure* and *jittable* with static ``axes``/``kind``
  arguments — the distributed PFFT layer composes them into one fused XLA
  program, so "plan construction" is trace+compile and "wisdom" is the XLA
  persistent compilation cache;
* complex FFTs use the XLA FFT (jnp.fft), which lowers to the TPU's native
  FFT expansion;
* real-to-real transforms (DCT/DST I-IV, DHT) are evaluated as dense
  cosine/sine basis contractions via ``dot_general`` — on TPU these are
  batched matmuls that run on the MXU systolic array, which for the sizes a
  pencil decomposition produces (N ≲ 4096 per axis) is faster than a VPU
  butterfly network and bit-reproducible;
* all transforms are **unnormalized** exactly like FFTW; normalization
  constants are applied by the plan layer (reference: fftw/xfftn.py:763-816).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .kinds import (
    FFTW_R2HC, FFTW_HC2R, FFTW_DHT,
    FFTW_REDFT00, FFTW_REDFT01, FFTW_REDFT10, FFTW_REDFT11,
    FFTW_RODFT00, FFTW_RODFT01, FFTW_RODFT10, FFTW_RODFT11,
)

__all__ = ['c2c', 'r2c', 'c2r', 'r2r', 'r2r_output_length']


# ---------------------------------------------------------------------------
# complex transforms — engine dispatch
# ---------------------------------------------------------------------------
# 'matmul' (default): MXU mixed-radix engine (ops.matfft) — the TPU-native
#     path, and also the engine used in sharded pipelines (the XLA CPU FFT
#     thunk miscompiles under sharded layouts in this toolchain).
# 'xla': the backend's native FFT op (jnp.fft).
import os as _os

_FFT_IMPL = _os.environ.get('MPI4PY_FFT_TPU_FFT_IMPL', 'matmul')


def set_fft_impl(impl):
    """Select the complex-FFT engine: 'matmul' (MXU mixed-radix) or 'xla'.
    Clears jit caches — compiled plans bake the engine in."""
    global _FFT_IMPL
    assert impl in ('matmul', 'xla')
    if impl != _FFT_IMPL:
        _FFT_IMPL = impl
        jax.clear_caches()


def get_fft_impl():
    return _FFT_IMPL


def c2c(x, axes, forward=True):
    """Unnormalized complex-to-complex FFT over ``axes``.

    forward: sign -1 exponent (FFTW_FORWARD); backward: sign +1, *not* scaled
    (FFTW convention — reference: fftw/fftw_planxfftn.c:43-49).
    """
    if _FFT_IMPL == 'matmul':
        from . import matfft
        return matfft.fftn(x, axes, forward)
    if forward:
        return jnp.fft.fftn(x, axes=axes)
    return jnp.fft.ifftn(x, axes=axes, norm="forward")


def r2c(x, axes):
    """Unnormalized real-to-complex FFT; ``axes[-1]`` is the halved axis
    (length N -> N//2+1), matching FFTW guru r2c layout
    (reference: fftw/fftw_planxfftn.c:50-56, fftw/xfftn.py:228-240)."""
    if _FFT_IMPL == 'matmul':
        from . import matfft
        return matfft.rfftn(x, axes)
    # jnp.fft.rfftn halves the *last* entry of axes, same convention.
    return jnp.fft.rfftn(x, axes=axes)


def c2r(x, axes, last_size):
    """Unnormalized complex-to-real inverse FFT; output length along
    ``axes[-1]`` is ``last_size`` (resolves the 2N-2 vs 2N-1 ambiguity,
    reference: fftw/xfftn.py:306-326)."""
    if _FFT_IMPL == 'matmul':
        from . import matfft
        return matfft.irfftn(x, axes, last_size)
    s = tuple(x.shape[a] for a in axes[:-1]) + (int(last_size),)
    return jnp.fft.irfftn(x, s=s, axes=axes, norm="forward")


# ---------------------------------------------------------------------------
# real-to-real transforms — MXU basis contractions
# ---------------------------------------------------------------------------

def r2r_output_length(N, kind):
    """Logical output length of a 1-D r2r transform of input length N.
    All FFTW r2r kinds are length-preserving."""
    return N


@functools.lru_cache(maxsize=None)
def _r2r_basis(N, kind, dtype_str):
    """Dense (N_out, N_in) basis matrix for an FFTW r2r kind, f64-built.

    Definitions follow FFTW's unnormalized conventions
    (http://fftw.org Real-to-Real Transform Kinds; validated against
    scipy.fft.dct/dst norm=None in tests/test_fftw.py).
    """
    n = np.arange(N)[None, :].astype(np.float64)   # input index
    k = np.arange(N)[:, None].astype(np.float64)   # output index
    if kind == FFTW_REDFT00:                       # DCT-I
        assert N > 1, "REDFT00 requires N >= 2"
        B = 2.0 * np.cos(np.pi * n * k / (N - 1))
        B[:, 0] *= 0.5
        B[:, -1] *= 0.5
    elif kind == FFTW_REDFT10:                     # DCT-II
        B = 2.0 * np.cos(np.pi * (n + 0.5) * k / N)
    elif kind == FFTW_REDFT01:                     # DCT-III
        B = 2.0 * np.cos(np.pi * n * (k + 0.5) / N)
        B[:, 0] *= 0.5
    elif kind == FFTW_REDFT11:                     # DCT-IV
        B = 2.0 * np.cos(np.pi * (n + 0.5) * (k + 0.5) / N)
    elif kind == FFTW_RODFT00:                     # DST-I
        B = 2.0 * np.sin(np.pi * (n + 1) * (k + 1) / (N + 1))
    elif kind == FFTW_RODFT10:                     # DST-II
        B = 2.0 * np.sin(np.pi * (n + 0.5) * (k + 1) / N)
    elif kind == FFTW_RODFT01:                     # DST-III
        B = 2.0 * np.sin(np.pi * (n + 1) * (k + 0.5) / N)
        B[:, -1] *= 0.5
    elif kind == FFTW_RODFT11:                     # DST-IV
        B = 2.0 * np.sin(np.pi * (n + 0.5) * (k + 0.5) / N)
    elif kind == FFTW_DHT:                         # discrete Hartley
        B = np.cos(2 * np.pi * n * k / N) + np.sin(2 * np.pi * n * k / N)
    else:
        raise ValueError(f"no dense basis for r2r kind {kind}")
    return B.astype(np.dtype(dtype_str))


def _apply_basis(x, B, axis):
    """Contract array axis with basis matrix B (N_out, N_in) on the MXU."""
    y = jnp.tensordot(x, B, axes=((axis,), (1,)),
                      precision=lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def _r2hc_1d(x, axis):
    """FFTW halfcomplex forward along one axis: output layout
    [r0..r_{N/2}, i_{(N+1)//2-1}..i_1] (FFTW halfcomplex format).
    Complex-free: routed through the planar engine."""
    from . import matfft
    N = x.shape[axis]
    P = matfft.rfftn_p(x, (axis,))        # planar (2, ..., N//2+1)
    re = P[0]
    n_im = (N + 1) // 2 - 1
    if n_im > 0:
        idx = jnp.arange(n_im, 0, -1)
        im = jnp.take(P[1], idx, axis=axis)
        return jnp.concatenate([re, im], axis=axis)
    return re


def _hc2r_1d(x, axis):
    """FFTW halfcomplex unnormalized inverse along one axis.
    Complex-free: routed through the planar engine."""
    from . import matfft
    N = x.shape[axis]
    re = jnp.take(x, jnp.arange(N // 2 + 1), axis=axis)
    n_im = (N + 1) // 2 - 1
    if n_im > 0:
        idx = jnp.arange(N - 1, N - 1 - n_im, -1)
        im = jnp.take(x, idx, axis=axis)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, N // 2 + 1 - (1 + n_im))
        im = jnp.pad(im, pad)
    else:
        im = jnp.zeros_like(re)
    P = jnp.stack([re, im])
    return matfft.irfftn_p(P, (axis,), N)


def r2r(x, axes, kinds):
    """Separable real-to-real transform: ``kinds[i]`` applied along
    ``axes[i]`` (reference semantics: fftw/fftw_planxfftn.c:57-76 r2r path,
    one FFTW kind per transformed dimension)."""
    assert len(axes) == len(kinds)
    dtype_str = np.dtype(x.dtype).name
    for axis, kind in zip(axes, kinds):
        if kind == FFTW_R2HC:
            x = _r2hc_1d(x, axis)
        elif kind == FFTW_HC2R:
            x = _hc2r_1d(x, axis)
        else:
            B = _r2r_basis(x.shape[axis], kind, dtype_str)
            x = _apply_basis(x, jnp.asarray(B), axis)
    return x
