"""Planar-complex parallel FFT — the TPU production pipeline.

TPU toolchains may not support complex dtypes at all (the target platform
rejects every complex-typed HLO).  This module provides the same fused
transform→transpose→transform pipeline as :class:`.mpifft.PFFT`, but with
every array real-typed: a complex field of global shape S is carried as a
real array of shape (2,) + S (leading planar axis; see ops/matfft.py).

The reference has no counterpart — this is the TPU-native answer to "the
compute path must run at full hardware rate": all butterflies are real MXU
matmuls, all twiddles real VPU ops, and the pencil transposes are XLA
all-to-alls over ICI on real buffers.

API sketch::

    pfft = PlanarPFFT(None, (1024, 1024, 1024), dtype='f')   # r2c
    u = jnp.zeros(pfft.global_shape(False))                  # real input
    u_hat = pfft.forward(u)      # planar (2, 1024, 1024, 513) real
    u2 = pfft.backward(u_hat)
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..ops import matfft
from .pencil import Pencil, Subcomm
from .comm import COMM_WORLD

__all__ = ['PlanarPFFT']


class PlanarPFFT(object):
    """Pencil/slab-decomposed FFT in planar-complex form.

    Parameters mirror :class:`.mpifft.PFFT` for the supported subset:
    c2c (complex input as planar (2,)+S) and r2c/c2r (real input).
    ``axes`` must be a flat axis sequence (one axis per stage; collapse is
    applied automatically to aligned trailing groups).
    """

    def __init__(self, comm=None, shape=None, axes=None, dtype='f',
                 grid=None, donate=False):
        shape = tuple(int(s) for s in shape)
        ndim = len(shape)
        if axes is None:
            axes = tuple(range(ndim))
        axes = tuple(a % ndim for a in axes)
        dtype = np.dtype(dtype)
        assert dtype.char in 'fdFD'
        self.real_transform = dtype.char in 'fd'
        self.rdtype = np.dtype('float32') if dtype.char in 'fF' \
            else np.dtype('float64')

        if grid is not None:
            dims = list(grid) + [1] * (ndim - len(grid))
        else:
            dims = [0] * ndim
            dims[axes[-1]] = 1
        self.subcomm = Subcomm(comm, dims)
        assert self.subcomm[axes[-1]].Get_size() == 1

        self.axes = axes
        self._input_shape = shape

        # spectral global shape (r2c halves the first-transformed axis)
        out_shape = list(shape)
        if self.real_transform:
            out_shape[axes[-1]] = shape[axes[-1]] // 2 + 1
        self._output_shape = tuple(out_shape)

        # pencil chain over the spectral shape, first-transformed axis last
        # (mirrors reference mpifft.py:308-338 plan construction)
        self.pencils = []
        pencil = Pencil(self.subcomm, out_shape, axes[-1])
        self.pencils.append(pencil)
        for ax in reversed(axes[:-1]):
            pencil = pencil.pencil(ax)
            self.pencils.append(pencil)
        self.pencil = [Pencil(self.subcomm, list(shape), axes[-1]),
                       self.pencils[-1]]

        Mtot = float(np.prod([shape[a] for a in axes]))
        self._norm = 1.0 / Mtot

        # donate=True reuses the input buffer's HBM for intermediates
        # (in-place semantics like FFTW_DESTROY_INPUT) — halves the
        # footprint for chip-filling transforms; the caller's input array
        # is invalidated after the call.
        dn = (0,) if donate else ()
        self._jit_forward = jax.jit(self._forward_impl, static_argnums=(1,),
                                    donate_argnums=dn)
        self._jit_backward = jax.jit(self._backward_impl, static_argnums=(1,),
                                     donate_argnums=dn)

    # ------------------------------------------------------------------
    def _forward_impl(self, x, normalize):
        axes = self.axes
        if self.real_transform:
            x = self.pencil[0].constrain(x)
            with jax.named_scope("planar_stage0_r2c"):
                p = matfft.rfftn_p(x, (axes[-1],))
                p = self.pencils[0].constrain(p, rank=1)
        else:
            # x: planar (2,)+S
            x = self.pencil[0].constrain(x, rank=1)
            with jax.named_scope("planar_stage0"):
                p = matfft.fft1d_p(x, axes[-1], True)
                p = self.pencils[0].constrain(p, rank=1)
        for i, ax in enumerate(reversed(axes[:-1])):
            pen = self.pencils[i + 1]
            with jax.named_scope(f"planar_transpose{i}"):
                p = pen.constrain(p, rank=1)
            with jax.named_scope(f"planar_stage{i + 1}"):
                p = matfft.fft1d_p(p, ax, True)
                p = pen.constrain(p, rank=1)
        if normalize:
            p = p * np.asarray(self._norm, dtype=self.rdtype)
        return p

    def _backward_impl(self, p, normalize):
        axes = self.axes
        p = self.pencils[-1].constrain(p, rank=1)
        for i, ax in enumerate(axes[:-1]):
            pen = self.pencils[len(axes) - 1 - i]
            p = pen.constrain(p, rank=1)
            with jax.named_scope(f"planar_bstage{i}"):
                p = matfft.fft1d_p(p, ax, False)
                p = pen.constrain(p, rank=1)
        p = self.pencils[0].constrain(p, rank=1)
        with jax.named_scope("planar_bstage_last"):
            if self.real_transform:
                y = matfft.irfftn_p(p, (axes[-1],),
                                    self._input_shape[axes[-1]])
                y = self.pencil[0].constrain(y)
            else:
                y = matfft.fft1d_p(p, axes[-1], False)
                y = self.pencil[0].constrain(y, rank=1)
        if normalize:
            y = y * np.asarray(self._norm, dtype=self.rdtype)
        return y

    # ------------------------------------------------------------------
    def forward(self, x, normalize=True):
        """Forward transform; real input (r2c) or planar input (c2c)."""
        return self._jit_forward(x, bool(normalize))

    def backward(self, p, normalize=False):
        """Backward transform; planar input, real (c2r) or planar output."""
        return self._jit_backward(p, bool(normalize))

    # pure path for composition under user jit
    def forward_fn(self, x, normalize=True):
        return self._forward_impl(x, normalize)

    def backward_fn(self, p, normalize=False):
        return self._backward_impl(p, normalize)

    def global_shape(self, forward_output=False):
        if forward_output:
            return (2,) + self._output_shape
        if self.real_transform:
            return self._input_shape
        return (2,) + self._input_shape
