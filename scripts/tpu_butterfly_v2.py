"""On-chip experiments, round 2: radix-4 butterfly timing, VMEM ceiling
probe, and an N=512 feasibility check.  Honest sync via scalar fetch.
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
    reps = int(os.environ.get('BENCH_REPS', 20))
    N = (n, n, n)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2,) + N).astype(np.float32))

    def sync(v):
        return np.asarray(jax.device_get(v.ravel()[:1]))[0]

    def bench(tag, fn, data=None, check_against=None):
        q0 = p if data is None else data
        j = jax.jit(fn)
        t0 = time.perf_counter()
        try:
            y = j(q0)
            sync(y)
        except Exception as e:
            print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None
        tc = time.perf_counter() - t0
        relmsg = ""
        if check_against is not None:
            matfft.set_butterfly_mode('off')
            try:
                ref = np.asarray(jax.device_get(jax.jit(check_against)(q0)))
            finally:
                matfft.set_butterfly_mode('auto')
            got = np.asarray(jax.device_get(y))
            rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-30)
            relmsg = f" rel={rel:.2e}"
        t0 = time.perf_counter()
        sync(y)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = j(q0)
        sync(y)
        dt = max(time.perf_counter() - t0 - ts, 1e-9) / reps
        print(f"{tag:28s} {dt * 1e3:8.2f} ms  (compile {tc:.0f}s){relmsg}",
              flush=True)
        return dt

    flops = 5.0 * n ** 3 * np.log2(float(n) ** 3)
    dt = bench('r4 full 3d', lambda q: pb.fft_axis_p(
        pb.fft_axis_p(pb.fft_axis_p(q, 2, True), 1, True), 0, True),
        check_against=lambda q: matfft.fft1d_p(
            matfft.fft1d_p(matfft.fft1d_p(q, 2, True), 1, True), 0, True))
    if dt:
        print(f"3-D radix-4 butterfly: {flops / dt / 1e9:.1f} GF/s",
              flush=True)
    bench('r4 axis2 (last)', lambda q: pb.fft_axis_p(q, 2, True))
    bench('r4 axis1 (mid)', lambda q: pb.fft_axis_p(q, 1, True))
    bench('r4 axis0 (lead)', lambda q: pb.fft_axis_p(q, 0, True))

    # N=512 single-axis attempt (expected VMEM-bound; prints FAILED if so)
    if os.environ.get('TRY_512', '1') == '1':
        old = pb._MAX_N
        pb._MAX_N = 512
        try:
            p512 = jnp.asarray(
                rng.standard_normal((2, 64, 512, 256)).astype(np.float32))
            bench('512 mid-axis', lambda q: pb.fft_axis_p(q, 1, True),
                  data=p512,
                  check_against=lambda q: matfft.fft1d_p(q, 1, True))
        finally:
            pb._MAX_N = old


if __name__ == '__main__':
    main()
# (appended A/B section driven via env in separate runs)
