"""On-chip A/B of lead-axis butterfly kernel variants.

The 3-D profile (scripts/tpu_butterfly_v2.py) shows the lead-axis kernel
at 1.25 ms vs 0.38 ms for the mid-axis kernel at 256^3 — the single
largest perf hole in the full 3-D chain.  Each run of this script times
ONE variant (set MPI4PY_FFT_TPU_LEAD_VARIANT before launch; the variant
is read at import time and jit caches would otherwise go stale).
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
    reps = int(os.environ.get('BENCH_REPS', 30))
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2, n, n, n)).astype(np.float32))

    def sync(v):
        return np.asarray(jax.device_get(v.ravel()[:1]))[0]

    def bench(tag, fn, data=None, check=False):
        q0 = p if data is None else data
        j = jax.jit(fn)
        t0 = time.perf_counter()
        try:
            y = j(q0)
            sync(y)
        except Exception as e:
            print(f"{tag:34s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return None
        tc = time.perf_counter() - t0
        relmsg = ""
        if check:
            prev_mode = matfft._BFLY_MODE
            matfft.set_butterfly_mode('off')
            try:
                ref = np.asarray(jax.device_get(
                    jax.jit(lambda q: matfft.fft1d_p(q, 0, True))(q0)))
            finally:
                matfft.set_butterfly_mode(prev_mode)
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
        print(f"{tag:34s} {dt * 1e3:8.3f} ms  (compile {tc:.0f}s){relmsg}",
              flush=True)
        return dt

    var = pb._LEAD_VARIANT
    bench(f'lead variant {var}',
          lambda q: pb.fft_axis_p(q, 0, True), check=True)


if __name__ == '__main__':
    main()
