"""On-chip A/B: fused two-axis plane kernel vs two single-axis kernels,
plus a DMA-floor copy probe for the lead-axis (axis 0) layout.
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
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.ops import matfft
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    n = int(os.environ.get('BENCH_N', 256))
    reps = int(os.environ.get('BENCH_REPS', 30))
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
            print(f"{tag:30s} FAILED: {type(e).__name__}: {str(e)[:200]}",
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
        print(f"{tag:30s} {dt * 1e3:8.3f} ms  (compile {tc:.0f}s){relmsg}",
              flush=True)
        return dt

    flops = 5.0 * n ** 3 * np.log2(float(n) ** 3)

    # fused plane (axes 1,2) alone
    bench('plane (ax1+ax2) fused', lambda q: pb.fft_plane_p(q, True),
          check_against=lambda q: matfft.fft1d_p(
              matfft.fft1d_p(q, 2, True), 1, True))
    # two single-axis kernels (current path)
    bench('ax2 then ax1 (2 kernels)', lambda q: pb.fft_axis_p(
        pb.fft_axis_p(q, 2, True), 1, True))
    # full 3-D: fused plane + lead axis
    dt = bench('full 3d plane+lead', lambda q: pb.fft_axis_p(
        pb.fft_plane_p(q, True), 0, True),
        check_against=lambda q: matfft.fft1d_p(
            matfft.fft1d_p(matfft.fft1d_p(q, 2, True), 1, True), 0, True))
    if dt:
        print(f"  -> {flops / dt / 1e9:.1f} GF/s", flush=True)

    # ---- DMA floor probes for the lead-axis layout ----
    def copy_kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def lead_copy(q, sub):
        # mimics _kern_lead block pattern: (2, N, sub, 128) blocks of
        # (2, N, post//128, 128)
        post = n * n
        x = q.reshape(2, n, post // 128, 128)
        return pl.pallas_call(
            copy_kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(post // (sub * 128),),
            in_specs=[pl.BlockSpec((2, n, sub, 128), lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, n, sub, 128), lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    def contig_copy(q):
        # fully contiguous blocks: (2, rows, 256) of (2, n*n, 256)
        x = q.reshape(2, n * n * n // 256, 256)
        R = 4096
        return pl.pallas_call(
            copy_kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[1] // R,),
            in_specs=[pl.BlockSpec((2, R, 256), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2, R, 256), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    bench('copy contiguous (floor)', contig_copy)
    for sub in (8, 16, 32):
        bench(f'copy lead-layout sub={sub}',
              functools.partial(lead_copy, sub=sub))

    # lead-axis fft with wider lane blocks (sub=16): VMEM probe
    bench('lead fft (current)', lambda q: pb.fft_axis_p(q, 0, True))


if __name__ == '__main__':
    main()
