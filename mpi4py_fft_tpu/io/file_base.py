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

    @staticmethod
    def _scalar_views(name, array, as_scalar):
        """Yield ``(dataset_name, scalar_field)`` pairs for one field.

        Rank-0 arrays (and everything when ``as_scalar`` is off) pass
        through unchanged; higher tensor ranks are exploded into one
        scalar view per component, suffixed with the component's index
        digits (``v`` -> ``v0``, ``v1`` ... / ``T01`` ...).  Matches the
        naming convention of the reference (io/file_base.py:49-78) but
        enumerates components via ``np.ndindex`` over the leading tensor
        dimensions instead of per-rank loops, so any tensor rank works.
        """
        rank = getattr(array, 'rank', 0)
        if not as_scalar or rank == 0:
            yield name, array
            return
        for idx in np.ndindex(*array.shape[:rank]):
            yield name + ''.join(map(str, idx)), array[idx]

    def write(self, step, fields, **kw):
        """Write snapshot ``step`` of ``fields`` to the file.

        ``fields`` maps a dataset name to a list of entries, each either
        a DistArray (whole-domain snapshot) or an ``(array,
        global_slice)`` pair (slice snapshot).  Semantics follow the
        reference (io/file_base.py:34-78); the implementation flattens
        every entry to ``(name, scalar_component, slice-or-None)``
        records first and then dispatches each record to the backend
        hook (`_write_group` / `_write_slice_step`).
        """
        as_scalar = kw.get("as_scalar", False)
        for name, entries in fields.items():
            if not (isinstance(name, str) and
                    isinstance(entries, (tuple, list))):
                raise TypeError("fields must map str -> list of arrays "
                                "or (array, global_slice) pairs")
            for entry in entries:
                if isinstance(entry, (tuple, list)):
                    array, gslice = entry
                else:
                    array, gslice = entry, None
                for dname, comp in self._scalar_views(name, array,
                                                      as_scalar):
                    self._check_domain(dname, comp)
                    if gslice is None:
                        self._write_group(dname, comp, step, **kw)
                    else:
                        self._write_slice_step(dname, step, gslice,
                                               comp, **kw)

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
