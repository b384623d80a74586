"""Device-group handle — the single-controller stand-in for an MPI communicator.

In the reference, every process holds an ``MPI.COMM_WORLD`` rank and arrays
are per-rank blocks (reference: mpi4py_fft/pencil.py:32-98).  Under JAX's
single-controller SPMD model there is one logical program and arrays are
*global*; the "communicator" degenerates to an ordered group of devices that
a mesh is built over.  ``DeviceComm`` keeps just enough MPI-communicator
surface (``Get_size``/``Get_rank``) for reference-shaped code to run.
"""
import jax

__all__ = ['DeviceComm', 'COMM_WORLD', 'comm_world']


class DeviceComm(object):
    """An ordered group of JAX devices acting as a communicator."""

    def __init__(self, devices=None):
        self._devices = tuple(devices) if devices is not None else None

    @property
    def devices(self):
        if self._devices is None:
            self._devices = tuple(jax.devices())
        return self._devices

    def Get_size(self):
        return len(self.devices)

    def Get_rank(self):
        # single controller: the process index (0 on a single host)
        return jax.process_index()

    def __len__(self):
        return len(self.devices)

    def __repr__(self):
        return f"DeviceComm({len(self.devices)} devices)"


#: module-level world communicator (resolved lazily so that test harnesses
#: can set XLA_FLAGS / platform before first use)
COMM_WORLD = DeviceComm()


def comm_world():
    return COMM_WORLD
