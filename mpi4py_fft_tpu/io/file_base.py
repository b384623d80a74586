"""Backend-independent snapshot writer base.

Reference semantics: mpi4py_fft/io/file_base.py.  ``write`` takes a dict of
group name -> list of fields, where a field is either a whole array or a
``(array, global_slice)`` 2-tuple; rank>0 tensors can be exploded into
scalar groups ``name + "{k}{l}"`` (reference: io/file_base.py:49-78).
"""
import numpy as np

__all__ = ('FileBase',)


class FileBase(object):
    """Base class for reading/writing distributed arrays
    (reference: io/file_base.py:8-140)."""

    def __init__(self, filename=None, domain=None):
        self.f = None
        self.filename = filename
        self.domain = domain

    def _check_domain(self, group, field):
        raise NotImplementedError

    def write(self, step, fields, **kw):
        """Write snapshot ``step`` of ``fields`` to file
        (reference: io/file_base.py:34-78)."""
        as_scalar = kw.get("as_scalar", False)

        def _write(group, u, sl, step, kw):
            if sl is None:
                self._write_group(group, u, step, **kw)
            else:
                self._write_slice_step(group, step, sl, u, **kw)

        for group, list_of_fields in fields.items():
            assert isinstance(list_of_fields, (tuple, list))
            assert isinstance(group, str)
            for field in list_of_fields:
                u = field[0] if isinstance(field, (tuple, list)) else field
                sl = field[1] if isinstance(field, (tuple, list)) else None
                if as_scalar is False or u.rank == 0:
                    self._check_domain(group, u)
                    _write(group, u, sl, step, kw)
                else:  # explode tensor components into scalar groups
                    if u.rank == 1:
                        for k in range(u.shape[0]):
                            g = group + str(k)
                            self._check_domain(g, u[k])
                            _write(g, u[k], sl, step, kw)
                    elif u.rank == 2:
                        for k in range(u.shape[0]):
                            for l in range(u.shape[1]):
                                g = group + str(k) + str(l)
                                self._check_domain(g, u[k, l])
                                _write(g, u[k, l], sl, step, kw)

    def read(self, u, name, **kw):
        raise NotImplementedError

    def close(self):
        self.f.close()

    def open(self, mode='r+'):
        raise NotImplementedError

    @staticmethod
    def backend():
        raise NotImplementedError

    def _write_slice_step(self, name, step, slices, field, **kwargs):
        raise NotImplementedError

    def _write_group(self, name, u, step, **kwargs):
        raise NotImplementedError

    @staticmethod
    def _get_slice_name(slices):
        """'slice_4_slice'-style name for a global slice spec
        (reference: io/file_base.py:119-128)."""
        parts = ['slice' if isinstance(ss, slice) else str(ss)
                 for ss in slices]
        return '_'.join(parts)

    @staticmethod
    def _slice_spec(slices):
        """Indices of the slice() entries of a global slice spec."""
        return np.nonzero([isinstance(x, slice) for x in slices])[0]
