"""Buffer-API staging cost: host round-trip vs the planar device path.

The reference executes into planned zero-copy buffers
(fftw_xfftn.pyx:237-249).  Here, a COMPLEX user array passed to
``Transform.__call__`` must stage through the host (complex dtypes do
not exist on the target TPU), while ``planar=True`` (or passing a
planar-shaped array) keeps everything device-resident.  This probe
measures both at 256^3 so README's cost statement is a number, not an
adjective.

Run:  python scripts/tpu_buffer_probe.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np


def main(n=256):
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu import PFFT

    fft = PFFT(None, (n, n, n), dtype='F')
    rng = np.random.default_rng(0)
    z = (rng.standard_normal((n,) * 3)
         + 1j * rng.standard_normal((n,) * 3)).astype(np.complex64)

    # -- classic buffer API: complex numpy in, complex out (host trips)
    u_hat = fft.forward(z)                       # compile + first run
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        u_hat = fft.forward(z)
    t_host = (time.perf_counter() - t0) / reps
    print(f"classic (complex host round-trip): {t_host * 1e3:8.1f} ms",
          flush=True)

    # -- planar device path: planar jax array in, planar out, no host
    zp = jax.device_put(jnp.asarray(np.stack([z.real, z.imag])))

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    y = fft.forward(zp, planar=True)             # warm
    sync(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fft.forward(zp, planar=True)
    sync(y)
    t_dev = (time.perf_counter() - t0) / reps
    print(f"planar=True (device resident):     {t_dev * 1e3:8.1f} ms",
          flush=True)
    print(f"staging overhead removed: {t_host / t_dev:.1f}x", flush=True)

    # correctness of the fast path
    yh = np.asarray(jax.device_get(y))
    ref = np.asarray(u_hat)
    rel = np.linalg.norm((yh[0] + 1j * yh[1]) - ref) / np.linalg.norm(ref)
    print(f"planar vs classic rel err: {rel:.2e}", flush=True)
    assert rel < 1e-6, rel


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:2]))
