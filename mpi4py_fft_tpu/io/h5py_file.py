"""HDF5 snapshot backend.

Reference semantics: mpi4py_fft/io/h5py_file.py.  The reference opens the
file with the MPI-IO driver and each rank writes its hyperslab
(io/h5py_file.py:33, 147-152); under the single-controller model the
controller writes the global array (one writer per host on multihost), with
identical resulting file layout:

    name/{ndim}D/{step}                  whole snapshots
    name/{ndim}D/{slicename}/{step}      global-slice snapshots
    name/domain/x{i} | name/mesh/x{i}    domain metadata
"""
import os

import numpy as np

from .file_base import FileBase

__all__ = ('HDF5File',)

# Multi-process access is serialized by our own global-device barriers
# (see :meth:`HDF5File.write`); HDF5's advisory file locking would
# deadlock the turn-taking (every process opens the file at least once),
# so it is disabled for this process — the role of the reference's
# MPI-IO driver coordination (reference: io/h5py_file.py:33).
os.environ.setdefault('HDF5_USE_FILE_LOCKING', 'FALSE')


class HDF5File(FileBase):
    """Read/write snapshots in the reference HDF5 schema
    (reference: io/h5py_file.py:9-152)."""

    def __init__(self, h5name, domain=None, mode='a', **kw):
        FileBase.__init__(self, h5name, domain=domain)
        import h5py
        import jax
        if jax.process_count() == 1 or jax.process_index() == 0:
            self.f = h5py.File(h5name, mode, **kw)
            self.close()
        if jax.process_count() > 1:
            # other processes wait for the file to exist
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("h5open")

    def _check_domain(self, group, field):
        """Store domain/mesh metadata + shape/rank attrs
        (reference: io/h5py_file.py:36-64)."""
        if self.domain is None:
            self.domain = ((0, 2 * np.pi),) * field.dimensions
        assert len(self.domain) == field.dimensions
        self.f.require_group(group)
        if "shape" not in self.f[group].attrs:
            self.f[group].attrs.create("shape", field.pencil.shape)
        if "rank" not in self.f[group].attrs:
            self.f[group].attrs.create("rank", field.rank)
        assert field.rank == self.f[group].attrs["rank"]
        assert np.all(field.pencil.shape == self.f[group].attrs["shape"])
        subgroup = "mesh" if isinstance(self.domain[0], np.ndarray) else "domain"
        self.f[group].require_group(subgroup)
        for i in range(field.dimensions):
            d = self.domain[i]
            if isinstance(d, np.ndarray):
                d0 = np.squeeze(d)
            else:
                d0 = np.array([d[0], d[1]])
            self.f[group][subgroup].require_dataset(
                f"x{i}", shape=d0.shape, dtype=d0.dtype, data=d0)

    @staticmethod
    def backend():
        return 'hdf5'

    def open(self, mode='r+'):
        import h5py
        self.f = h5py.File(self.filename, mode)

    def write(self, step, fields, **kw):
        """Write snapshot ``step`` (reference: io/h5py_file.py:74-119).

        Each process writes only the hyperslabs of the shards it can
        address (the reference's per-rank mpio writes,
        io/h5py_file.py:147-152).  Without an MPI-IO driver the processes
        take turns on the file, serialized by a global device barrier."""
        import jax
        if jax.process_count() == 1:
            self.open()
            FileBase.write(self, step, fields, **kw)
            self.close()
            return
        from jax.experimental import multihost_utils
        for p in range(jax.process_count()):
            if jax.process_index() == p:
                self.open()
                FileBase.write(self, step, fields, **kw)
                self.close()
            multihost_utils.sync_global_devices(f"h5w{p}")

    def read(self, u, name, **kw):
        """Read whole snapshot into DistArray ``u``; data is resharded to
        ``u``'s decomposition on assignment — reader decomposition may
        differ from the writer's (reference: io/h5py_file.py:121-127 and
        docs/io.rst:61-62)."""
        step = kw.get('step', 0)
        self.open('r')
        dset = "/".join((name, f"{u.dimensions}D", str(step)))
        u[...] = np.asarray(self.f[dset])
        self.close()

    def _write_slice_step(self, name, step, slices, field, **kw):
        """Write a global slice of the array
        (reference: io/h5py_file.py:129-145)."""
        rank = field.rank
        slices = list((slice(None),) * rank + tuple(slices))
        ndims = slices[rank:].count(slice(None))
        slname = self._get_slice_name(slices[rank:])
        sp = self._slice_spec(slices)
        group = "/".join((name, f"{ndims}D", slname))
        self.f.require_group(group)
        N = field.global_shape
        self.f[group].require_dataset(
            str(step), shape=tuple(np.take(N, sp)), dtype=field.dtype)
        import jax
        if jax.process_index() == 0:
            # global-slice writes gather the slice (cheap, lower-dim) and
            # are emitted once (the reference writes from owning ranks,
            # io/h5py_file.py:129-145)
            self.f["/".join((group, str(step)))][...] = \
                np.asarray(field)[tuple(slices)]

    def _write_group(self, name, u, step, **kw):
        """Write the whole global array as per-shard hyperslabs — each
        process touches only the blocks it can address
        (reference: io/h5py_file.py:147-152)."""
        group = "/".join((name, f"{u.dimensions}D"))
        self.f.require_group(group)
        self.f[group].require_dataset(str(step), shape=u.global_shape,
                                      dtype=u.dtype)
        dset = self.f["/".join((group, str(step)))]
        if hasattr(u, 'addressable_blocks'):
            for sl, block in u.addressable_blocks():
                dset[sl] = block
        else:
            dset[...] = np.asarray(u)
