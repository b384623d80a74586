"""Parallel FFT orchestration: plan construction and the fused pipeline.

TPU-native re-design of the reference orchestrator
(reference: mpi4py_fft/mpifft.py).  The *plan construction* algorithm is the
same — walk the axes groups last→first, planning a serial transform per
group and a pencil rotation between groups, with r2c/padding global-shape
fixups (reference: mpifft.py:213-338).  The *executor* is different: instead
of a Python loop alternating buffer FFTs and Alltoallw calls
(reference: mpifft.py:46-79), the whole chain

    transform -> reshard -> transform -> ... -> reshard -> transform

is traced into ONE jitted XLA program; GSPMD turns each reshard into an
all-to-all over ICI and overlaps it with the butterfly compute.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..libfft import FFT
from .pencil import Pencil, Subcomm
from .comm import DeviceComm, COMM_WORLD

__all__ = ['PFFT', 'Transform']


class Transform(object):
    """One direction of a parallel transform (reference: mpifft.py:8-79).

    ``stages`` are pure per-group functions, ``reshards`` the pure pencil
    rotations applied *before* stages[1:].  The object is callable with the
    reference's buffer semantics and also exposes :meth:`fn` — the pure
    function used for fusing into larger jitted programs (e.g. a full DNS
    time step).
    """

    def __init__(self, pfft, stages, reshards, pencils, in_shape, in_dtype,
                 out_shape, out_dtype, default_normalize, host_mode,
                 stage_pencils=None):
        assert len(stages) == len(reshards) + 1 and len(pencils) == 2
        self._pfft = pfft
        self._stages = tuple(stages)
        self._reshards = tuple(reshards)
        self._pencil = tuple(pencils)
        # the pencil each stage computes in; stage outputs are pinned to it
        # so GSPMD's backward sharding propagation cannot re-layout a
        # transform onto its own (sharded) transform axis — that would turn
        # the pencil transpose into an all-gather instead of an all-to-all
        self._stage_pencils = tuple(stage_pencils) if stage_pencils else \
            (pencils[0],) * len(stages)
        self._in_shape = tuple(in_shape)
        self._in_dtype = np.dtype(in_dtype)
        self._out_shape = tuple(out_shape)
        self._out_dtype = np.dtype(out_dtype)
        self._default_normalize = default_normalize
        self._host_mode = host_mode
        self._input_buffer = None
        self._output_buffer = None
        if host_mode:
            self._jit = None
        else:
            self._jit = jax.jit(self._impl, static_argnums=(1,))

    # -- pure pipeline -----------------------------------------------------
    def _impl(self, x, normalize):
        x = self._pencil[0].constrain(x)
        with jax.named_scope("pfft_stage0"):
            x = self._stages[0](x, normalize)
            x = self._stage_pencils[0].constrain(x)
        for i, (stage, reshard) in enumerate(
                zip(self._stages[1:], self._reshards)):
            with jax.named_scope(f"pfft_transpose{i}"):
                x = reshard(x)
            with jax.named_scope(f"pfft_stage{i + 1}"):
                x = stage(x, normalize)
                x = self._stage_pencils[i + 1].constrain(x)
        x = self._pencil[1].constrain(x)
        return x

    def fn(self, x, normalize=None):
        """Pure jittable application (compose freely under jax.jit)."""
        normalize = self._default_normalize if normalize is None else normalize
        return self._impl(x, normalize)

    # -- reference-style properties ---------------------------------------
    @property
    def input_pencil(self):
        return self._pencil[0]

    @property
    def output_pencil(self):
        return self._pencil[1]

    @property
    def input_array(self):
        """Persistent input DistArray (reference: mpifft.py:26-29)."""
        if self._input_buffer is None:
            from ..distarray import DistArray
            self._input_buffer = DistArray(
                self._in_shape, subcomm=self._pencil[0].subcomm, val=0,
                dtype=self._in_dtype, alignment=self._pencil[0].axis,
                mesh=self._pencil[0].mesh)
        return self._input_buffer

    @property
    def output_array(self):
        """Persistent output DistArray (reference: mpifft.py:31-34)."""
        if self._output_buffer is None:
            from ..distarray import DistArray
            self._output_buffer = DistArray(
                self._out_shape, subcomm=self._pencil[1].subcomm, val=0,
                dtype=self._out_dtype, alignment=self._pencil[1].axis,
                mesh=self._pencil[1].mesh)
        return self._output_buffer

    # -- execution ---------------------------------------------------------
    def __call__(self, input_array=None, output_array=None, **kw):
        """Execute the transform (reference: mpifft.py:46-79).

        Unlike the reference there is no per-rank local view: input and
        output are *global* arrays (DistArray, numpy or jax).
        """
        from ..distarray import DistArray
        normalize = kw.pop('normalize', self._default_normalize)
        if input_array is None:
            input_array = self.input_array
        if isinstance(input_array, DistArray):
            x = input_array._data
        else:
            x = jnp.asarray(np.asarray(input_array))

        if self._host_mode:
            y = np.asarray(x)
            y = self._stages[0](y, normalize)
            for stage in self._stages[1:]:
                y = stage(y, normalize)
            y = jnp.asarray(np.ascontiguousarray(y))
            y = jax.device_put(y, self._pencil[1].boundary_sharding())
        else:
            x = x.astype(self._in_dtype)
            x = jax.device_put(x, self._pencil[0].boundary_sharding())
            y = self._jit(x, bool(normalize))

        out = self.output_array
        out._data = y
        if output_array is not None:
            if isinstance(output_array, DistArray):
                output_array._data = y
            else:
                output_array[...] = np.asarray(y)
            return output_array
        return out


class PFFT(object):
    """Parallel transform over a device mesh (reference: mpifft.py:82-419).

    Parameters follow the reference PFFT.  ``comm`` may be ``None`` (all
    devices), a :class:`DeviceComm`, a device list, or a prebuilt
    :class:`Subcomm`.  ``backend='jax'`` (default) fuses the whole pipeline
    into one XLA program; ``'numpy'``/``'scipy'`` run the same plan on host
    arrays for cross-validation.
    """

    def __init__(self, comm=None, shape=None, axes=None, dtype=float,
                 grid=None, padding=False, collapse=False, backend='jax',
                 transforms=None, darray=None, **kw):
        if shape is None:
            assert darray is not None
            shape = darray.pencil.shape

        # ---- axes normalization (reference: mpifft.py:213-240) ----------
        if axes is not None:
            axes = list(axes) if not isinstance(axes, int) else [axes]
        else:
            axes = list(range(len(shape)))
            if darray is not None:
                axes = list(np.roll(axes, len(shape) - 1 - darray.alignment))
        for i, ax in enumerate(axes):
            if isinstance(ax, (int, np.integer)):
                ax = int(ax)
                if ax < 0:
                    ax += len(shape)
                axes[i] = (ax,)
            else:
                assert isinstance(ax, (tuple, list))
                ax = list(ax)
                for j, a in enumerate(ax):
                    assert isinstance(a, int)
                    if a < 0:
                        ax[j] = a + len(shape)
                axes[i] = ax
            assert min(axes[i]) >= 0
            assert max(axes[i]) < len(shape)
            assert 0 < len(axes[i]) <= len(shape)
            assert sorted(axes[i]) == sorted(set(axes[i]))

        self.axes = axes
        shape = list(shape)

        if darray is None:
            dtype = np.dtype(dtype)
            assert dtype.char in 'fdFD', \
                f"dtype {dtype}: TPU tiers are f32/f64 (no long double)"

            # ---- padding inflation (reference: mpifft.py:247-253) -------
            if padding is not False:
                assert len(padding) == len(shape)
                padding = list(padding)
                for ax in axes:
                    if len(ax) == 1 and padding[ax[0]] > 1.0 + 1e-6:
                        old = float(shape[ax[0]])
                        shape[ax[0]] = int(np.floor(shape[ax[0]] * padding[ax[0]]))
                        padding[ax[0]] = shape[ax[0]] / old

            self._input_shape = tuple(shape)
            assert len(shape) > 0
            assert min(shape) > 0

            slab = kw.pop('slab', False)

            # ---- processor grid -> Subcomm (reference: mpifft.py:259-290)
            if grid is not None:
                assert not isinstance(comm, Subcomm)
                assert slab is False
                grid = tuple(grid)
                assert len(grid) <= len(shape)
                dims = list(grid) + [1] * (len(shape) - len(grid))
                comm = Subcomm(comm, dims)

            if isinstance(comm, Subcomm):
                assert slab is False
                assert len(comm) == len(shape)
                assert np.all([comm[ax].Get_size() == 1 for ax in axes[-1]])
                self.subcomm = comm
            else:
                if slab is False or slab is None:
                    dims = [0] * len(shape)
                    for ax in axes[-1]:
                        dims[ax] = 1
                else:
                    if slab is True:
                        axis = (axes[-1][-1] + 1) % len(shape)
                    else:
                        axis = slab
                        if axis < 0:
                            axis = axis + len(shape)
                        assert 0 <= axis < len(shape)
                    dims = [1] * len(shape)
                    dims[axis] = 0  # wildcard: all devices on this axis
                self.subcomm = Subcomm(comm, dims)
        else:
            dtype = darray.dtype
            self.subcomm = darray.subcomm_tuple
            self._input_shape = tuple(shape)
            commsizes = darray.commsizes
            assert np.all([commsizes[ax] == 1 for ax in axes[-1]]), \
                "Set keyword axes such that axes to transform first are aligned"
            padding = False

        self._mesh = getattr(self.subcomm, 'mesh', None)
        if self._mesh is None and darray is not None:
            self._mesh = darray.pencil.mesh

        # ---- collapse (reference: mpifft.py:298-306) --------------------
        self.collapse = collapse
        if collapse is True:
            groups = [[]]
            for ax in reversed(axes):
                if np.all([self.subcomm[axis].Get_size() == 1 for axis in ax]):
                    [groups[0].insert(0, axis) for axis in reversed(ax)]
                else:
                    groups.insert(0, ax)
            axes = [g for g in groups if len(g) > 0]

        self.axes = tuple(map(tuple, axes))
        self.xfftn = []
        self.transfer = []
        self.pencil = [None, None]
        self.backend = backend

        # ---- stage chain (reference: mpifft.py:308-338) -----------------
        axes = self.axes[-1]
        pencil = Pencil(self.subcomm, shape, axes[-1])
        pencil.mesh = self._mesh
        xfftn = FFT(shape, axes, dtype, padding, backend=backend,
                    transforms=transforms, **kw)
        self.xfftn.append(xfftn)
        self.pencil[0] = pencilA = pencil
        stage_in_pencils = [pencil]
        if not shape[axes[-1]] == xfftn.forward.output_array.shape[axes[-1]]:
            dtype = xfftn.forward.output_array.dtype
            shape = list(xfftn.forward.output_array.shape)
            pencilA = Pencil(self.subcomm, shape, axes[-1])
            pencilA.mesh = self._mesh

        for axes in reversed(self.axes[:-1]):
            pencilB = pencilA.pencil(axes[-1])
            transAB = pencilA.transfer(pencilB, dtype)
            xfftn = FFT(shape, axes, dtype, padding, backend=backend,
                        transforms=transforms, **kw)
            self.xfftn.append(xfftn)
            self.transfer.append(transAB)
            stage_in_pencils.append(pencilB)
            pencilA = pencilB
            if not shape[axes[-1]] == xfftn.forward.output_array.shape[axes[-1]]:
                dtype = xfftn.forward.output_array.dtype
                shape = list(xfftn.forward.output_array.shape)
                pencilA = Pencil(pencilB.subcomm, shape, axes[-1])
                pencilA.mesh = self._mesh

        self.pencil[1] = pencilA
        self._output_shape = tuple(shape)
        self._stage_in_pencils = stage_in_pencils

        host_mode = backend in ('numpy', 'scipy', 'mkl_fft')
        in_dtype = self.xfftn[0].forward.input_array.dtype
        out_dtype = self.xfftn[-1].forward.output_array.dtype

        fwd_stages = [o.forward_fn for o in self.xfftn]
        fwd_reshards = [t.forward_fn for t in self.transfer]
        self.forward = Transform(
            self, fwd_stages, fwd_reshards, self.pencil,
            self._input_shape, in_dtype, self._output_shape, out_dtype,
            default_normalize=True, host_mode=host_mode)

        bck_stages = [o.backward_fn for o in self.xfftn[::-1]]
        # backward reshards: undo each forward rotation, in reverse order
        bck_reshards = [t.backward_fn for t in self.transfer[::-1]]
        self.backward = Transform(
            self, bck_stages, bck_reshards, self.pencil[::-1],
            self._output_shape, out_dtype, self._input_shape, in_dtype,
            default_normalize=False, host_mode=host_mode)

    # ---- reference API (reference: mpifft.py:349-419) -------------------
    def destroy(self):
        if isinstance(self.subcomm, Subcomm):
            self.subcomm.destroy()
        for trans in self.transfer:
            trans.destroy()

    def shape(self, forward_output=True):
        """Global shape of the transform data.

        Note: the reference returns the *per-rank local* shape
        (mpifft.py:355-366); under the single-controller global-view model
        users allocate global arrays, so the global shape is returned.  Use
        :meth:`local_shape` for per-device shard shapes.
        """
        if forward_output is not True:
            return self._input_shape
        return self._output_shape

    def local_shape(self, forward_output=True, device_index=0):
        """Per-device shard shape (the reference's ``shape``)."""
        p = self.pencil[1] if forward_output else self.pencil[0]
        return p.local_shape(device_index)

    def local_slice(self, forward_output=True, device_index=0):
        """The view of one device's shard into the global array
        (reference: mpifft.py:368-386)."""
        ip = self.pencil[1] if forward_output else self.pencil[0]
        return tuple(slice(start, start + n) for start, n in
                     zip(ip.local_start(device_index),
                         ip.local_shape(device_index)))

    def global_shape(self, forward_output=False):
        """Reference: mpifft.py:388-400."""
        if forward_output:
            return self._output_shape
        return self._input_shape

    @property
    def dimensions(self):
        """Reference: mpifft.py:402-405."""
        return len(self._input_shape)

    def dtype(self, forward_output=False):
        """Reference: mpifft.py:407-419."""
        if forward_output:
            return self.xfftn[-1].forward.output_array.dtype
        return self.xfftn[0].forward.input_array.dtype
