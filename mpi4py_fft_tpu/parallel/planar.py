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
from jax import lax
from jax.sharding import PartitionSpec

from .mpifft import shmap as _checkfree_shard_map

from ..ops import matfft
from ..ops.pallas_butterfly import fused_tp_enabled as pb_fused_tp_enabled
from .pencil import Pencil, Subcomm
from .comm import COMM_WORLD

__all__ = ['PlanarPFFT']


def _local_fft1d(p, ax, forward, scale=None):
    """Per-shard 1-D planar transform with explicit butterfly-kernel
    dispatch (inside shard_map the engine's single-device auto check does
    not apply — local shard shapes decide kernel support)."""
    from ..ops import pallas_butterfly as pb
    if matfft._BFLY_MODE != 'off' and jax.default_backend() == 'tpu':
        if pb.supported_axis(p.shape[1:], ax, p.dtype):
            return pb.fft_axis_p(p, ax, forward, scale=scale)
        # long local axes (N = 2048): the fused pair-kernel pass
        with matfft.local_dispatch():
            if matfft._use_butterfly_pair(p.shape[1:], ax, p.dtype):
                return matfft._butterfly_pair(p, ax, forward, scale)
    return matfft.fft1d_p(p, ax, forward, scale=scale)


def _local_rfft(x, ax, hext=None):
    """Per-shard r2c with explicit kernel dispatch (see _local_fft1d)."""
    from ..ops import pallas_butterfly as pb
    if (matfft._BFLY_MODE != 'off' and jax.default_backend() == 'tpu'
            and pb.supported_r2c(x.shape, ax, x.dtype)):
        return pb.rfft_axis_p(x, ax, hext=hext)
    N = x.shape[ax]
    p = jnp.stack([x, jnp.zeros_like(x)])
    p = matfft.fft1d_p(p, ax, True)
    p = p[_axslice(p, 1 + ax, slice(0, N // 2 + 1))]
    if hext is not None and hext > N // 2 + 1:
        pad = [(0, 0)] * p.ndim
        pad[1 + ax] = (0, hext - (N // 2 + 1))
        p = jnp.pad(p, pad)
    return p


def _local_irfft(p, ax, n, scale=None):
    """Per-shard c2r with explicit kernel dispatch (see _local_fft1d)."""
    from ..ops import pallas_butterfly as pb
    if (matfft._BFLY_MODE != 'off' and jax.default_backend() == 'tpu'
            and pb.supported_c2r(p.shape[1:], ax, n, p.dtype)):
        return pb.irfft_axis_p(p, ax, n, scale=scale)
    return matfft.irfftn_p(p, (ax,), n, scale=scale)


# planar 3/2-rule truncation / zero-padding live with the other dealiasing
# helpers in libfft (reference semantics: libfft.py:263-311)
from ..libfft import _axslice, truncate_planar, pad_planar  # noqa: E402


class PlanarPFFT(object):
    """Pencil/slab-decomposed FFT in planar-complex form.

    Parameters mirror :class:`.mpifft.PFFT` for the supported subset:
    c2c (complex input as planar (2,)+S) and r2c/c2r (real input).
    ``axes`` must be a flat axis sequence (one axis per stage; collapse is
    applied automatically to aligned trailing groups).
    """

    def __init__(self, comm=None, shape=None, axes=None, dtype='f',
                 grid=None, donate=False, padding=False, pad_spectrum=False,
                 executor='auto', a2a_chunks=None):
        from . import overlap as _ov
        self._a2a_cfg = _ov.chunk_count(a2a_chunks)
        shape = list(int(s) for s in shape)
        ndim = len(shape)
        if axes is None:
            axes = tuple(range(ndim))
        axes = tuple(a % ndim for a in axes)
        dtype = np.dtype(dtype)
        assert dtype.char in 'fdFD'
        self.real_transform = dtype.char in 'fd'
        self.rdtype = np.dtype('float32') if dtype.char in 'fF' \
            else np.dtype('float64')

        # dealiasing: inflate physical shape, re-derive exact factors
        # (reference: mpifft.py:247-253)
        self._pad = [1.0] * ndim
        if padding is not False and padding is not None:
            padding = [padding] * ndim if np.ndim(padding) == 0 else list(padding)
            assert len(padding) == ndim
            for ax in axes:
                if padding[ax] > 1.0 + 1e-6:
                    old = float(shape[ax])
                    shape[ax] = int(np.floor(shape[ax] * padding[ax]))
                    self._pad[ax] = shape[ax] / old
        shape = tuple(shape)

        if grid is not None:
            dims = list(grid) + [1] * (ndim - len(grid))
        else:
            dims = [0] * ndim
            dims[axes[-1]] = 1
        self.subcomm = Subcomm(comm, dims)
        assert self.subcomm[axes[-1]].Get_size() == 1

        self.axes = axes
        self._input_shape = shape

        # truncated spectral extents per axis (== padded extent when no
        # dealiasing); r2c halves the first-transformed axis
        self._trunc = {ax: int(np.round(shape[ax] / self._pad[ax]))
                       for ax in axes}
        out_shape = list(shape)
        for ax in axes:
            out_shape[ax] = self._trunc[ax]
        if self.real_transform:
            out_shape[axes[-1]] = self._trunc[axes[-1]] // 2 + 1
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

        # r2c: the halved axis (extent N//2+1, usually odd) is transformed
        # first and never again, but is resharded by every later transpose;
        # an odd extent makes GSPMD fall back to all-gather+slice.  Pad it
        # with zero rows to the lcm of every group size that shards it, and
        # slice back at the pipeline boundary — transposes then move evenly
        # divisible extents and stay pure all-to-all over ICI.
        # pad_spectrum=True keeps the r2c spectrum at the padded extent
        # (trailing zero rows) so no boundary slice — and therefore no
        # GSPMD all-gather — is ever emitted; pointwise spectral algebra
        # and the backward transform are exact on the padded form.
        self._pad_spectrum = bool(pad_spectrum)
        self._hpad_ext = None
        if self.real_transform:
            hax = axes[-1]
            q = 1
            for pen in self.pencils:
                q = int(np.lcm(q, pen.subcomm[hax].Get_size()))
            nh = self._output_shape[hax]
            if q > 1 and nh % q:
                self._hpad_ext = (-(-nh // q)) * q

        Mtot = float(np.prod([shape[a] for a in axes]))
        self._norm = 1.0 / Mtot

        # per-axis padded extents for the shard_map executor: each axis is
        # rounded up to the lcm of every group size that shards it anywhere
        # in the pencil chain, so uniform per-shard programs and pure tiled
        # all_to_all transposes cover non-divisible (reference 12/13-style)
        # extents too.  Pad rows are exact zeros at the tail of the axis;
        # every local transform slices its axis back to the true extent
        # first, so the math is exact.  Equal to the true extents for all
        # production (power-of-two) shapes.
        ndim_ = len(shape)
        qs = [1] * ndim_
        for pen in [self.pencil[0]] + list(self.pencils):
            for i, c in enumerate(pen.subcomm):
                qs[i] = int(np.lcm(qs[i], c.Get_size()))
        self._axis_lcm = tuple(qs)
        self._phys_pad_shape = tuple(-(-shape[i] // qs[i]) * qs[i]
                                     for i in range(ndim_))
        spec = list(self._output_shape)
        if self._hpad_ext is not None:
            spec[axes[-1]] = self._hpad_ext
        self._spec_pad_shape = tuple(-(-spec[i] // qs[i]) * qs[i]
                                     for i in range(ndim_))

        # -- executor: 'gspmd' traces one global program and lets GSPMD
        # infer the collectives from sharding constraints; 'shard_map'
        # writes the per-shard program with explicit lax.all_to_all
        # transposes — required for multi-chip Pallas kernels (GSPMD
        # cannot partition a pallas_call) and gives deterministic
        # collective placement.  'auto' uses shard_map whenever the mesh
        # is multi-device (uneven extents ride the padded form above).
        assert executor in ('auto', 'gspmd', 'shard_map')
        nmesh = int(np.prod(self.subcomm.mesh.devices.shape))
        shmap_ok = nmesh > 1
        if executor == 'auto':
            import os as _os
            pref = _os.environ.get('MPI4PY_FFT_TPU_EXECUTOR', 'shard_map')
            executor = pref if (pref == 'shard_map' and shmap_ok) \
                else 'gspmd'
        elif executor == 'shard_map':
            assert shmap_ok, "shard_map executor needs a multi-device mesh"
        self.executor = executor
        self._nmesh = nmesh

        # double-single f64 tier (ops/pallas_ds.py): when the dtype is
        # double and the shapes ride the DS kernels, the pipeline runs in
        # two-float32 compensated arithmetic on the fast VPU path instead
        # of the emulated x64 einsum engine — the performance-bearing
        # analogue of the reference's double-precision FFTW build
        # (reference: libfft.py:225,314 f64 default, setup.py:83-141)
        self._ds_hext = None
        self._ds = self._ds_supported()

        # donate=True reuses the input buffer's HBM for intermediates
        # (in-place semantics like FFTW_DESTROY_INPUT) — halves the
        # footprint for chip-filling transforms; the caller's input array
        # is invalidated after the call.
        dn = (0,) if donate else ()
        if self._ds:
            fwd = self._forward_ds_shmap if executor == 'shard_map' \
                else self._forward_ds
            bwd = self._backward_ds_shmap if executor == 'shard_map' \
                else self._backward_ds
        else:
            fwd = self._forward_shmap if executor == 'shard_map' \
                else self._forward_impl
            bwd = self._backward_shmap if executor == 'shard_map' \
                else self._backward_impl
        self._jit_forward = jax.jit(fwd, static_argnums=(1,),
                                    donate_argnums=dn)
        self._jit_backward = jax.jit(bwd, static_argnums=(1,),
                                     donate_argnums=dn)

    # -- double-single f64 tier ----------------------------------------
    def _ds_supported(self):
        """Whether this plan runs on the DS kernel tier: double
        precision, no dealiasing, and every stage's (per-shard) shapes
        inside the kernel gates.  Multi-device: c2c over evenly
        divisible extents on the shard_map executor (the (2, 2)+S
        planar-DS layout rides the tiled all_to_all transposes
        unchanged).  r2c pads the halved axis to a tileable extent
        (``_ds_hext``, exact zero rows) for the mid-axis passes."""
        from ..ops import pallas_ds as ds
        if not ds.ds_wanted() or self.rdtype != np.float64:
            return False
        if any(f != 1.0 for f in self._pad):
            return False
        shape = self._input_shape
        axes = self.axes
        if self._nmesh == 1:
            if self.real_transform:
                ax0 = axes[-1]
                if not ds.supported_rfft_ds(shape, ax0):
                    return False
                # pad the halved axis with zero rows to the smallest m
                # that keeps every mid-axis pass (8, 128)-tileable
                nh = shape[ax0] // 2 + 1
                need = 1
                for ax in axes[:-1]:
                    pother = int(np.prod(
                        [shape[j] for j in range(len(shape))
                         if j not in (ax, ax0)], dtype=np.int64))
                    need = int(np.lcm(
                        need, 1024 // int(np.gcd(1024, pother))))
                m = -(-nh // need) * need
                if m > 2 * nh + 8:      # padding would outweigh the win
                    return False
                spec = list(shape)
                spec[ax0] = m
                if not all(ds.supported_ds(tuple(spec), ax)
                           for ax in axes[:-1]):
                    return False
                self._ds_hext = m
                return True
            return all(ds.supported_ds(shape, ax) for ax in axes)
        # multi-device: c2c, shard_map, divisible extents, shard gates
        if (self.real_transform or self.executor != 'shard_map'
                or self._phys_pad_shape != tuple(shape)
                or self._spec_pad_shape != tuple(self._output_shape)):
            return False
        stage_axes = [axes[-1]] + list(reversed(axes[:-1]))
        for pen, ax in zip(self.pencils, stage_axes):
            local = tuple(n // pen.subcomm[j].Get_size()
                          for j, n in enumerate(shape))
            if not ds.supported_ds(local, ax):
                return False
        return True

    def _forward_ds(self, x, normalize):
        """Single-device DS forward (c2c and r2c)."""
        from ..ops import pallas_ds as ds
        axes = self.axes
        ax0 = axes[-1]
        if self.real_transform:
            q = ds.rfft_axis_ds(ds.split_real_ds(x), ax0,
                                hext=self._ds_hext)
        else:
            q = ds.fft_axis_ds(ds.split_planar_ds(x), ax0, True)
        for ax in reversed(axes[:-1]):
            q = ds.fft_axis_ds(q, ax, True)
        if normalize:
            q = ds.scale_ds(q, self._norm)
        p = ds.join_planar_ds(q)
        if self.real_transform and self._ds_hext is not None:
            p = self._slice_ax(p, 1 + ax0, self._output_shape[ax0])
        return p

    def _backward_ds(self, p, normalize):
        """Single-device DS backward (c2c and c2r)."""
        from ..ops import pallas_ds as ds
        axes = self.axes
        ax0 = axes[-1]
        q = ds.split_planar_ds(p)
        if self.real_transform and self._ds_hext is not None:
            q = self._pad_ax(q, 2 + ax0, self._ds_hext)
        for ax in axes[:-1]:
            q = ds.fft_axis_ds(q, ax, False)
        sc = self._norm if normalize else None
        if self.real_transform:
            y = ds.irfft_axis_ds(q, ax0, self._input_shape[ax0], scale=sc)
            return ds.join_real_ds(y)
        q = ds.fft_axis_ds(q, ax0, False)
        if sc is not None:
            q = ds.scale_ds(q, sc)
        return ds.join_planar_ds(q)

    def _transpose_lax_ds(self, q, i, forward=True):
        """Pencil transpose of planar-DS data: same tiled all_to_all as
        :meth:`_transpose_lax`, with the extra (hi, lo) leading axis."""
        pa, pb = self.pencils[i], self.pencils[i + 1]
        g = pa.subcomm[pb.axis].name
        if g is None:
            return q
        if forward:
            return lax.all_to_all(q, g, split_axis=2 + pa.axis,
                                  concat_axis=2 + pb.axis, tiled=True)
        return lax.all_to_all(q, g, split_axis=2 + pb.axis,
                              concat_axis=2 + pa.axis, tiled=True)

    def _forward_ds_shmap(self, x, normalize):
        from ..ops import pallas_ds as ds
        axes = self.axes

        def local(q):
            q = ds.fft_axis_ds(q, axes[-1], True)
            for i, ax in enumerate(reversed(axes[:-1])):
                q = self._transpose_lax_ds(q, i, True)
                q = ds.fft_axis_ds(q, ax, True)
            if normalize:
                q = ds.scale_ds(q, self._norm)
            return q

        names0 = [c.name for c in self.pencil[0].subcomm]
        namesN = [c.name for c in self.pencils[-1].subcomm]
        f = _checkfree_shard_map(
            local, mesh=self.subcomm.mesh,
            in_specs=(PartitionSpec(None, None, *names0),),
            out_specs=PartitionSpec(None, None, *namesN))
        return ds.join_planar_ds(f(ds.split_planar_ds(x)))

    def _backward_ds_shmap(self, p, normalize):
        from ..ops import pallas_ds as ds
        axes = self.axes

        def local(q):
            for i, ax in enumerate(axes[:-1]):
                q = ds.fft_axis_ds(q, ax, False)
                q = self._transpose_lax_ds(q, len(axes) - 2 - i, False)
            q = ds.fft_axis_ds(q, axes[-1], False)
            if normalize:
                q = ds.scale_ds(q, self._norm)
            return q

        names0 = [c.name for c in self.pencil[0].subcomm]
        namesN = [c.name for c in self.pencils[-1].subcomm]
        f = _checkfree_shard_map(
            local, mesh=self.subcomm.mesh,
            in_specs=(PartitionSpec(None, None, *namesN),),
            out_specs=PartitionSpec(None, None, *names0))
        return ds.join_planar_ds(f(ds.split_planar_ds(p)))

    # ------------------------------------------------------------------
    def _padded(self, ax):
        return self._pad[ax] > 1.0 + 1e-8

    @staticmethod
    def _slice_ax(p, ax, n):
        """Slice axis ``ax`` down to extent ``n`` (no-op when equal)."""
        if p.shape[ax] > n:
            return p[_axslice(p, ax, slice(0, n))]
        return p

    @staticmethod
    def _pad_ax(p, ax, n):
        """Zero-pad axis ``ax`` up to extent ``n`` (no-op when equal)."""
        if n > p.shape[ax]:
            pad = [(0, 0)] * p.ndim
            pad[ax] = (0, n - p.shape[ax])
            return jnp.pad(p, pad)
        return p

    def _pad_axes(self, p, target, off):
        for i, n in enumerate(target):
            p = self._pad_ax(p, off + i, n)
        return p

    def _slice_axes(self, p, target, off):
        for i, n in enumerate(target):
            p = self._slice_ax(p, off + i, n)
        return p

    # -- shard_map executor --------------------------------------------
    def _transpose_lax(self, p, i, forward=True):
        """Explicit pencil transpose pencils[i] <-> pencils[i+1]: one
        tiled lax.all_to_all over the single participating group (role of
        reference Transfer.forward/backward, pencil.py:168-201)."""
        pa, pb = self.pencils[i], self.pencils[i + 1]
        axA, axB = pa.axis, pb.axis
        g = pa.subcomm[axB]
        if g.name is None:
            return p
        if forward:
            return lax.all_to_all(p, g.name, split_axis=1 + axA,
                                  concat_axis=1 + axB, tiled=True)
        return lax.all_to_all(p, g.name, split_axis=1 + axB,
                              concat_axis=1 + axA, tiled=True)

    def _forward_local(self, x, normalize):
        """Per-shard forward program (runs under shard_map).

        Axes arrive at their *padded* extents (``_phys_pad_shape``, exact
        zero tail rows); each is sliced back to its true extent when it is
        aligned for its transform, and the spectral result is re-padded to
        ``_spec_pad_shape`` so every tiled all_to_all moves evenly
        divisible extents."""
        axes = self.axes
        ax0 = axes[-1]
        spad0 = self._spec_pad_shape[ax0]
        if self.real_transform:
            from ..ops import pallas_butterfly as _pb
            x = self._slice_ax(x, ax0, self._input_shape[ax0])
            if self._padded(ax0):
                nt0 = self._trunc[ax0] // 2 + 1
                if (pb_fused_tp_enabled()
                        and matfft._BFLY_MODE != 'off'
                        and _pb.supported_r2c(x.shape, ax0, x.dtype)):
                    # hermitian 3/2-rule truncation fused into the r2c
                    # kernel write (+ shardable-extent zero rows)
                    p = _pb.rfft_axis_p(x, ax0, hext=max(spad0, nt0),
                                        trunc=nt0)
                else:
                    p = _local_rfft(x, ax0)
                    p = truncate_planar(p, 1 + ax0, nt0, hermitian=True)
                    p = self._pad_ax(p, 1 + ax0, spad0)
            else:
                p = _local_rfft(x, ax0,
                                hext=spad0 if spad0 > x.shape[ax0] // 2 + 1
                                else None)
        else:
            x = self._slice_ax(x, 1 + ax0, self._input_shape[ax0])
            p = _local_fft1d(x, ax0, True)
            if self._padded(ax0):
                p = truncate_planar(p, 1 + ax0, self._trunc[ax0],
                                    hermitian=False)
            p = self._pad_ax(p, 1 + ax0, spad0)
        nmid = len(axes) - 1
        folded = False
        for i, ax in enumerate(reversed(axes[:-1])):
            sc = self._norm if (normalize and i == nmid - 1) else None
            folded = folded or sc is not None

            def chain(pc, i=i, ax=ax, sc=sc):
                from ..ops import pallas_butterfly as _pb
                pc = self._transpose_lax(pc, i, True)
                pc = self._slice_ax(pc, 1 + ax, self._input_shape[ax])
                if self._padded(ax) and pb_fused_tp_enabled() and \
                        _pb.supported_axis_tp(
                            pc.shape[1:], ax, pc.dtype,
                            trunc=self._trunc[ax]):
                    # dealiasing truncation fused into the kernel's own
                    # HBM write — no separate slice pass
                    pc = _pb.fft_axis_tp(pc, ax, True,
                                         trunc=self._trunc[ax], scale=sc)
                else:
                    pc = _local_fft1d(pc, ax, True, scale=sc)
                    if self._padded(ax):
                        pc = truncate_planar(pc, 1 + ax, self._trunc[ax],
                                             hermitian=False)
                return self._pad_ax(pc, 1 + ax, self._spec_pad_shape[ax])
            p = self._overlapped_step(p, i, ax, chain)
        if normalize and not folded:
            p = p * np.asarray(self._norm, dtype=self.rdtype)
        return p

    def _overlapped_step(self, p, i, ax, chain):
        """Run one transpose+transform pipeline step, chunked along an
        uninvolved axis so chunk k's butterfly stage overlaps chunk k+1's
        all_to_all (see parallel/overlap.py; the reference's hot loop is
        strictly sequential, mpifft.py:68-72)."""
        from . import overlap as _ov
        pa, pb = self.pencils[i], self.pencils[i + 1]
        if pa.subcomm[pb.axis].name is None:       # no comm: nothing to hide
            return chain(p)
        used = {pa.axis, pb.axis, ax}
        cands = [c for c in range(len(self._input_shape)) if c not in used]
        if not cands:
            return chain(p)
        c = max(cands, key=lambda c: p.shape[1 + c])
        n = _ov.resolve(self._a2a_cfg, p.size * p.dtype.itemsize,
                        p.shape[1 + c])
        return _ov.overlapped(p, 1 + c, n, chain)

    def _backward_local(self, p, normalize):
        """Per-shard backward program (runs under shard_map); axes arrive
        at ``_spec_pad_shape`` extents and leave at ``_phys_pad_shape``."""
        axes = self.axes
        for i, ax in enumerate(axes[:-1]):

            def chain(pc, i=i, ax=ax):
                from ..ops import pallas_butterfly as _pb
                pc = self._slice_ax(pc, 1 + ax, self._trunc[ax])
                if self._padded(ax) and pb_fused_tp_enabled() and \
                        _pb.supported_axis_tp(
                            pc.shape[1:], ax, pc.dtype,
                            pad=self._input_shape[ax]):
                    # zero-padding fused into the kernel's own HBM read
                    pc = _pb.fft_axis_tp(pc, ax, False,
                                         pad=self._input_shape[ax])
                else:
                    if self._padded(ax):
                        pc = pad_planar(pc, 1 + ax, self._input_shape[ax],
                                        hermitian=False)
                    pc = _local_fft1d(pc, ax, False)
                pc = self._pad_ax(pc, 1 + ax, self._phys_pad_shape[ax])
                return self._transpose_lax(pc, len(axes) - 2 - i, False)
            p = self._overlapped_step(p, len(axes) - 2 - i, ax, chain)
        ax0 = axes[-1]
        p = self._slice_ax(p, 1 + ax0, self._output_shape[ax0])
        if self.real_transform:
            from ..ops import pallas_butterfly as _pb
            N0 = self._input_shape[ax0]
            if (self._padded(ax0) and pb_fused_tp_enabled()
                    and matfft._BFLY_MODE != 'off'
                    and _pb._PACKED_MODE == 'on'
                    and _pb.supported_c2r(p.shape[1:], ax0, N0, p.dtype)):
                # hermitian zero-padding fused into the c2r kernel read
                y = _pb.irfft_axis_p(
                    p, ax0, N0, scale=self._norm if normalize else None)
            else:
                if self._padded(ax0):
                    p = pad_planar(p, 1 + ax0, N0 // 2 + 1,
                                   hermitian=True)
                y = _local_irfft(p, ax0, N0,
                                 scale=self._norm if normalize else None)
            y = self._pad_ax(y, ax0, self._phys_pad_shape[ax0])
        else:
            if self._padded(ax0):
                p = pad_planar(p, 1 + ax0, self._input_shape[ax0],
                               hermitian=False)
            y = _local_fft1d(p, ax0, False,
                             scale=self._norm if normalize else None)
            y = self._pad_ax(y, 1 + ax0, self._phys_pad_shape[ax0])
        return y

    def _phys_spec(self):
        names = [c.name for c in self.pencil[0].subcomm]
        if self.real_transform:
            return PartitionSpec(*names)
        return PartitionSpec(None, *names)

    def _spec_spec(self):
        return PartitionSpec(None, *[c.name for c in
                                     self.pencils[-1].subcomm])

    def _spec_contract_shape(self):
        """User-facing spectral extents: true extents, except the r2c axis
        which stays padded under the ``pad_spectrum`` contract."""
        sh = list(self._output_shape)
        if self._pad_spectrum and self._hpad_ext is not None:
            sh[self.axes[-1]] = self._hpad_ext
        return tuple(sh)

    def _forward_shmap(self, x, normalize):
        off = 0 if self.real_transform else 1
        x = self._pad_axes(x, self._phys_pad_shape, off)
        f = _checkfree_shard_map(lambda q: self._forward_local(q, normalize),
                                 mesh=self.subcomm.mesh,
                                 in_specs=(self._phys_spec(),),
                                 out_specs=self._spec_spec())
        p = f(x)
        # boundary slice back to the user contract (no-op for production
        # shapes; for uneven extents GSPMD pays one gather here, never in
        # the pipeline's transposes)
        return self._slice_axes(p, self._spec_contract_shape(), 1)

    def _backward_shmap(self, p, normalize):
        p = self._pad_axes(p, self._spec_pad_shape, 1)
        f = _checkfree_shard_map(lambda q: self._backward_local(q, normalize),
                                 mesh=self.subcomm.mesh,
                                 in_specs=(self._spec_spec(),),
                                 out_specs=self._phys_spec())
        y = f(p)
        off = 0 if self.real_transform else 1
        return self._slice_axes(y, self._input_shape, off)

    def _forward_impl(self, x, normalize):
        axes = self.axes
        ax0 = axes[-1]
        if self.real_transform:
            x = self.pencil[0].constrain(x)
            with jax.named_scope("planar_stage0_r2c"):
                p = matfft.rfftn_p(x, (ax0,))
                if self._padded(ax0):
                    p = truncate_planar(p, 1 + ax0,
                                        self._trunc[ax0] // 2 + 1,
                                        hermitian=True)
                if self._hpad_ext is not None:
                    pad = [(0, 0)] * p.ndim
                    pad[1 + ax0] = (0, self._hpad_ext - p.shape[1 + ax0])
                    p = jnp.pad(p, pad)
                p = self.pencils[0].constrain(p, rank=1)
        else:
            # x: planar (2,)+S
            x = self.pencil[0].constrain(x, rank=1)
            with jax.named_scope("planar_stage0"):
                p = matfft.fft1d_p(x, ax0, True)
                if self._padded(ax0):
                    p = truncate_planar(p, 1 + ax0, self._trunc[ax0],
                                        hermitian=False)
                p = self.pencils[0].constrain(p, rank=1)
        nmid = len(axes) - 1
        folded = False
        for i, ax in enumerate(reversed(axes[:-1])):
            pen = self.pencils[i + 1]
            last = (i == nmid - 1)
            sc = self._norm if (normalize and last) else None
            folded = folded or sc is not None
            with jax.named_scope(f"planar_transpose{i}"):
                p = pen.constrain(p, rank=1)
            with jax.named_scope(f"planar_stage{i + 1}"):
                p = matfft.fft1d_p(p, ax, True, scale=sc)
                if self._padded(ax):
                    p = truncate_planar(p, 1 + ax, self._trunc[ax],
                                        hermitian=False)
                p = pen.constrain(p, rank=1)
        if self._hpad_ext is not None and not self._pad_spectrum:
            p = p[_axslice(p, 1 + ax0, slice(0, self._output_shape[ax0]))]
            p = self.pencils[-1].constrain(p, rank=1)
        if normalize and not folded:
            p = p * np.asarray(self._norm, dtype=self.rdtype)
        return p

    def _backward_impl(self, p, normalize):
        axes = self.axes
        if self._hpad_ext is not None:
            hax = axes[-1]
            pad = [(0, 0)] * p.ndim
            pad[1 + hax] = (0, self._hpad_ext - p.shape[1 + hax])
            p = jnp.pad(p, pad)
        p = self.pencils[-1].constrain(p, rank=1)
        for i, ax in enumerate(axes[:-1]):
            pen = self.pencils[len(axes) - 1 - i]
            p = pen.constrain(p, rank=1)
            with jax.named_scope(f"planar_bstage{i}"):
                if self._padded(ax):
                    p = pad_planar(p, 1 + ax, self._input_shape[ax],
                                   hermitian=False)
                p = matfft.fft1d_p(p, ax, False)
                p = pen.constrain(p, rank=1)
        p = self.pencils[0].constrain(p, rank=1)
        ax0 = axes[-1]
        if self._hpad_ext is not None:
            p = p[_axslice(p, 1 + ax0, slice(0, self._output_shape[ax0]))]
        with jax.named_scope("planar_bstage_last"):
            if self.real_transform:
                if self._padded(ax0):
                    p = pad_planar(p, 1 + ax0,
                                   self._input_shape[ax0] // 2 + 1,
                                   hermitian=True)
                y = matfft.irfftn_p(p, (ax0,), self._input_shape[ax0],
                                    scale=self._norm if normalize else None)
                y = self.pencil[0].constrain(y)
            else:
                if self._padded(ax0):
                    p = pad_planar(p, 1 + ax0, self._input_shape[ax0],
                                   hermitian=False)
                y = matfft.fft1d_p(p, ax0, False,
                                   scale=self._norm if normalize else None)
                y = self.pencil[0].constrain(y, rank=1)
        return y

    # ------------------------------------------------------------------
    def _check_shape(self, x, forward_output):
        want = tuple(self.global_shape(forward_output))
        got = tuple(x.shape)
        if forward_output and self._hpad_ext is not None:
            # the spectrum is accepted in both the padded (shardable
            # extent) and the unpadded N//2+1 form — backward repads
            alt = list(want)
            alt[1 + self.axes[-1]] = self._hpad_ext \
                if want[1 + self.axes[-1]] != self._hpad_ext \
                else self._output_shape[self.axes[-1]]
            if got == tuple(alt):
                return
        assert got == want, \
            f"array shape {got} does not match the planned shape {want}"

    def forward(self, x, normalize=True):
        """Forward transform; real input (r2c) or planar input (c2c)."""
        self._check_shape(x, False)
        return self._jit_forward(x, bool(normalize))

    def backward(self, p, normalize=False):
        """Backward transform; planar input, real (c2r) or planar output."""
        self._check_shape(p, True)
        return self._jit_backward(p, bool(normalize))

    # pure path for composition under user jit (shapes are static under
    # tracing, so the same plan-shape validation as forward/backward is
    # free here too)
    def forward_fn(self, x, normalize=True):
        self._check_shape(x, False)
        if self._ds:
            return (self._forward_ds_shmap if self.executor == 'shard_map'
                    else self._forward_ds)(x, normalize)
        if self.executor == 'shard_map':
            return self._forward_shmap(x, normalize)
        return self._forward_impl(x, normalize)

    def backward_fn(self, p, normalize=False):
        self._check_shape(p, True)
        if self._ds:
            return (self._backward_ds_shmap if self.executor == 'shard_map'
                    else self._backward_ds)(p, normalize)
        if self.executor == 'shard_map':
            return self._backward_shmap(p, normalize)
        return self._backward_impl(p, normalize)

    # quartered out-of-place schedule (ops/oop3d.py) — the production
    # path for chip-filling single-device c2c volumes, where in-place
    # aliasing costs ~30% HBM bandwidth but a full out-of-place
    # ping-pong pair would exceed HBM.  State stays quartered across
    # chained transforms; split/assemble only at the boundaries.
    @property
    def quartered(self):
        """True when forward_fn_q/backward_fn_q apply to this plan:
        single-device, plain 3-D c2c in natural axis order, no
        dealiasing, kernel-supported quarter shapes."""
        from ..ops import oop3d
        return (self._nmesh == 1
                and not self.real_transform
                and len(self._input_shape) == 3
                and tuple(self.axes) == (0, 1, 2)
                and all(f == 1.0 for f in self._pad)
                and oop3d.supported_q(self._input_shape, self.rdtype))

    def forward_fn_q(self, qs, normalize=True):
        """Forward transform of a quartered planar volume (see
        ops/oop3d.split_q); returns transformed quarters."""
        assert self.quartered
        from ..ops import oop3d
        return oop3d.fft3_q(qs, True,
                            scale=self._norm if normalize else None)

    def backward_fn_q(self, qs, normalize=False):
        """Backward transform of a quartered planar spectrum."""
        assert self.quartered
        from ..ops import oop3d
        return oop3d.fft3_q(qs, False,
                            scale=self._norm if normalize else None)

    def global_shape(self, forward_output=False):
        if forward_output:
            if self._pad_spectrum and self._hpad_ext is not None:
                sh = list(self._output_shape)
                sh[self.axes[-1]] = self._hpad_ext
                return (2,) + tuple(sh)
            return (2,) + self._output_shape
        if self.real_transform:
            return self._input_shape
        return (2,) + self._input_shape
