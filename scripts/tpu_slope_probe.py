"""Separate per-dispatch overhead from true per-pass device time.

Chains k in-place passes INSIDE one jit (k = 1, 3, 5) and fits
time(k) = a + b*k: b is the true per-pass cost, a the dispatch overhead
(axon tunnel RPC + launch).  Probes: pallas copy (lead blocking),
pallas copy (contiguous planes), full radix-4 butterfly axis kernel.

Run:  python scripts/tpu_slope_probe.py [512|1024]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def timed(j, x, reps=5):
        y = j(x)
        sync(y)
        for _ in range(2):
            y = j(y)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = j(y)
        sync(y)
        dt = (time.perf_counter() - t0) / reps
        del y
        return dt

    def probe(tag, mk_pass, gb_per_pass):
        ts = {}
        for k in (1, 3, 5):
            def f(x, kk=k):
                for _ in range(kk):
                    x = mk_pass(x)
                return x
            j = jax.jit(f, donate_argnums=(0,))
            key = jax.random.PRNGKey(0)
            x = jax.jit(lambda kq: jax.random.uniform(
                kq, (2, n, n, n), jnp.float32, -0.5, 0.5))(key)
            ts[k] = timed(j, x)
        b = (ts[5] - ts[1]) / 4
        a = ts[1] - b
        print(f"  {tag:28s} k1={ts[1]*1e3:8.3f} k3={ts[3]*1e3:8.3f} "
              f"k5={ts[5]*1e3:8.3f} ms  -> per-pass {b*1e3:7.3f} ms "
              f"({gb_per_pass / b:6.0f} GB/s), overhead {a*1e3:6.3f} ms",
              flush=True)

    def k_copy(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def copy_lead(x):
        return pl.pallas_call(
            k_copy,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(n // 8, n // 128),
            in_specs=[pb._bspec((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                                memory_space=pltpu.VMEM)],
            out_specs=pb._bspec((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                                memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2 ** 20),
        )(x)

    def copy_plane(x):
        return pl.pallas_call(
            k_copy,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(n,),
            in_specs=[pb._bspec((2, 1, n, n), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)],
            out_specs=pb._bspec((2, 1, n, n), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2 ** 20),
        )(x)

    gb2 = 2 * 2 * n ** 3 * 4 / 1e9            # r+w bytes per pass
    print(f"== slope probe at {n}^3 planar f32", flush=True)
    probe('pallas copy lead-blocked', copy_lead, gb2)
    probe('pallas copy contig planes', copy_plane, gb2)
    probe('butterfly axis0 (lead)',
          lambda x: pb.fft_axis_p(x, 0, True), gb2)
    probe('butterfly axis1 (mid)',
          lambda x: pb.fft_axis_p(x, 1, True), gb2)
    probe('butterfly axis2 (last)',
          lambda x: pb.fft_axis_p(x, 2, True), gb2)
    probe('plane_large (axes 1+2)',
          lambda x: pb.fft_plane_large_p(x, True), 2 * gb2)


if __name__ == '__main__':
    main()
