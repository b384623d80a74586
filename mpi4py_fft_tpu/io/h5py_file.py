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
import numpy as np

from .file_base import FileBase

__all__ = ('HDF5File',)


class HDF5File(FileBase):
    """Read/write snapshots in the reference HDF5 schema
    (reference: io/h5py_file.py:9-152)."""

    def __init__(self, h5name, domain=None, mode='a', **kw):
        FileBase.__init__(self, h5name, domain=domain)
        import h5py
        self.f = h5py.File(h5name, mode, **kw)
        self.close()

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
        """Write snapshot ``step`` (reference: io/h5py_file.py:74-119)."""
        self.open()
        FileBase.write(self, step, fields, **kw)
        self.close()

    def read(self, u, name, **kw):
        """Read whole snapshot into DistArray ``u``; data is resharded to
        ``u``'s decomposition on assignment — reader decomposition may
        differ from the writer's (reference: io/h5py_file.py:121-127 and
        docs/io.rst:61-62)."""
        step = kw.get('step', 0)
        self.open()
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
        self.f["/".join((group, str(step)))][...] = \
            np.asarray(field)[tuple(slices)]

    def _write_group(self, name, u, step, **kw):
        """Write the whole global array
        (reference: io/h5py_file.py:147-152)."""
        group = "/".join((name, f"{u.dimensions}D"))
        self.f.require_group(group)
        self.f[group].require_dataset(str(step), shape=u.global_shape,
                                      dtype=u.dtype)
        self.f["/".join((group, str(step)))][...] = np.asarray(u)
