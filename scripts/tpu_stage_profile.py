"""Per-stage timing of the planar pipeline on the current device.

Times each axis transform and each (single-device: relayout) transpose of
the 3-D planar forward separately, plus the fused pipeline, to show where
time goes.  Honest sync via scalar fetch.
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
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.ops import matfft

    n = int(os.environ.get('BENCH_N', 256))
    reps = int(os.environ.get('BENCH_REPS', 10))
    N = (n, n, n)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2,) + N).astype(np.float32))

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def bench(tag, fn):
        j = jax.jit(fn)
        y = j(p if 'ax' in tag or 'full' in tag else p)
        sync(y)
        t0 = time.perf_counter()
        sync(y)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = j(p)
        sync(y)
        dt = max(time.perf_counter() - t0 - ts, 1e-9) / reps
        print(f"{tag:24s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    t2 = bench('fft axis2 (last)', lambda q: matfft.fft1d_p(q, 2, True))
    t1 = bench('fft axis1 (mid)', lambda q: matfft.fft1d_p(q, 1, True))
    t0_ = bench('fft axis0 (mid)', lambda q: matfft.fft1d_p(q, 0, True))
    bench('twiddle-free mul x2', lambda q: q * 2.0)
    tf = bench('full 3d', lambda q: matfft.fft1d_p(
        matfft.fft1d_p(matfft.fft1d_p(q, 2, True), 1, True), 0, True))
    print(f"sum of stages: {(t0_ + t1 + t2) * 1e3:.2f} ms "
          f"vs fused: {tf * 1e3:.2f} ms", flush=True)


if __name__ == '__main__':
    main()
