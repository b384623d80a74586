"""On-chip test of the Stockham butterfly kernel (ops/pallas_butterfly.py).

Correctness vs the einsum engine + per-axis timing vs the einsum engine,
then a full 3-D composition.  Honest sync via scalar fetch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')
os.environ.setdefault('MPI4PY_FFT_TPU_PALLAS', 'off')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.ops import matfft
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    n = int(os.environ.get('BENCH_N', 256))
    reps = int(os.environ.get('BENCH_REPS', 10))
    N = (n, n, n)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2,) + N).astype(np.float32))

    def sync(v):
        return float(np.asarray(jax.device_get(v.ravel()[:1]))[0])

    def bench(tag, fn, check_against=None):
        j = jax.jit(fn)
        t0 = time.perf_counter()
        y = j(p)
        sync(y)
        tc = time.perf_counter() - t0
        if check_against is not None:
            # force the einsum engine for the reference value
            matfft.set_butterfly_mode('off')
            try:
                ref = np.asarray(jax.device_get(jax.jit(check_against)(p)))
            finally:
                matfft.set_butterfly_mode('auto')
            got = np.asarray(jax.device_get(y))
            rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-30)
            relmsg = f" rel={rel:.2e}"
        else:
            relmsg = ""
        t0 = time.perf_counter()
        sync(y)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = j(p)
        sync(y)
        dt = max(time.perf_counter() - t0 - ts, 1e-9) / reps
        print(f"{tag:28s} {dt * 1e3:8.2f} ms  (compile {tc:.0f}s){relmsg}",
              flush=True)
        return dt

    ein = jax.jit(lambda q: matfft.fft1d_p(q, 2, True))

    # per-axis butterfly vs einsum
    bench('bfly axis2 (last)', lambda q: pb.fft_axis_p(q, 2, True),
          check_against=lambda q: matfft.fft1d_p(q, 2, True))
    bench('bfly axis1 (mid)', lambda q: pb.fft_axis_p(q, 1, True),
          check_against=lambda q: matfft.fft1d_p(q, 1, True))
    bench('bfly axis0 (lead)', lambda q: pb.fft_axis_p(q, 0, True),
          check_against=lambda q: matfft.fft1d_p(q, 0, True))
    bench('einsum axis2 (last)', lambda q: matfft.fft1d_p(q, 2, True))

    # full 3-D
    flops = 5.0 * n ** 3 * np.log2(float(n) ** 3)
    dt = bench('bfly full 3d', lambda q: pb.fft_axis_p(
        pb.fft_axis_p(pb.fft_axis_p(q, 2, True), 1, True), 0, True),
        check_against=lambda q: matfft.fft1d_p(
            matfft.fft1d_p(matfft.fft1d_p(q, 2, True), 1, True), 0, True))
    print(f"3-D butterfly: {flops / dt / 1e9:.1f} GF/s (5NlogN)", flush=True)


if __name__ == '__main__':
    main()
