"""Multi-host execution support.

The reference scales across nodes transparently through MPI: the same
per-rank program runs everywhere and `MPI.COMM_WORLD` spans the cluster.
The JAX counterpart is `jax.distributed`: every host runs the same
single-controller program, `jax.devices()` spans the whole pod slice, and
the meshes built by :class:`.pencil.Subcomm` automatically include every
host's chips — XLA routes intra-host mesh edges over ICI and inter-host
edges over DCN.

Usage (one call before any other mpi4py_fft_tpu use, on every host)::

    from mpi4py_fft_tpu.parallel import multihost
    multihost.initialize()           # env-driven (TPU pods autoconfigure)
    # ... identical program as single-host ...

On TPU pods `jax.distributed.initialize()` needs no arguments; elsewhere
pass ``coordinator_address``, ``num_processes``, ``process_id``.
"""
import jax

__all__ = ['initialize', 'finalize', 'is_multihost', 'process_count',
           'process_index', 'sync_global_devices']

_initialized = [False]


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kw):
    """Bring up the cross-host runtime (idempotent)."""
    if _initialized[0]:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    kwargs.update(kw)
    jax.distributed.initialize(**kwargs)
    _initialized[0] = True


def finalize():
    if _initialized[0]:
        jax.distributed.shutdown()
        _initialized[0] = False


def is_multihost():
    return jax.process_count() > 1


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def sync_global_devices(name='sync'):
    """Barrier across all hosts (role of a global MPI barrier)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
