"""Snapshot IO for distributed arrays.

Replaces the reference's parallel-IO layer (reference: mpi4py_fft/io/).
Under the single-controller model a "parallel write" degenerates to a
per-host sharded write; on one host the global array is written directly.
The on-disk schemas (HDF5 group layout, NetCDF variable naming, XDMF
structure) are kept identical to the reference so downstream tooling
(ParaView/VisIt via XDMF) keeps working.
"""
from .file_base import FileBase  # noqa: F401
from .h5py_file import HDF5File  # noqa: F401
from .nc_file import NCFile      # noqa: F401
from .generate_xdmf import generate_xdmf  # noqa: F401
