"""TPU strategy experiments: mid-axis einsum vs moveaxis vs pallas kernel.

Times the full 3-D planar c2c forward at BENCH_N^3 under each engine
strategy on the current default device.  Honest sync via scalar fetch.
Results guide the default engine configuration; run on a quiet chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT
    from mpi4py_fft_tpu.ops import matfft

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(os.environ.get('BENCH_N', 256))
    reps = int(os.environ.get('BENCH_REPS', 10))
    N = (n, n, n)
    flops = 5.0 * n ** 3 * np.log2(float(n) ** 3)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2,) + N).astype(np.float32))

    def sync(v):
        return float(np.asarray(jax.device_get(v[0, 0, 0, :1])))

    def run(tag):
        pfft = PlanarPFFT(None, N, dtype='F')
        fwd = jax.jit(lambda q: pfft.forward_fn(q, normalize=False))
        t0 = time.perf_counter()
        y = fwd(p)
        sync(y)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(y)
        t_sync = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fwd(p)
        sync(y)
        dt = max(time.perf_counter() - t0 - t_sync, 1e-9) / reps
        # small correctness spot check
        got = np.asarray(jax.device_get(y[:, :2, :2, :2]))
        print(f"{tag:28s} {dt * 1e3:9.2f} ms  {flops / dt / 1e9:9.1f} GF/s "
              f"(compile {t_compile:.0f}s)  spot={got[0, 0, 0, 0]:.3f}",
              flush=True)
        return dt

    matfft.set_pallas_mode('off')
    matfft.set_mid_axis_strategy('einsum')
    run('einsum-mid, no pallas')

    matfft.set_mid_axis_strategy('moveaxis')
    jax.clear_caches()
    run('moveaxis, no pallas')

    matfft.set_pallas_mode('on')
    jax.clear_caches()
    run('moveaxis + pallas(all axes)')

    matfft.set_mid_axis_strategy('einsum')
    jax.clear_caches()
    run('einsum-mid + pallas(last)')


if __name__ == '__main__':
    main()
