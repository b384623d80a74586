"""A/B the LARGE fused two-axis plane kernel (fft_plane_large_p) against
two chained single-axis kernels on the real chip.

At 1024^3 a 3-D c2c currently runs 6 HBM passes (3 x 2-pass axis
kernels) ~ 90 ms; fusing the last two axes into one kernel cuts that to
4 passes.  Correctness anchor: plane kernel vs chained axis kernels,
rel err < 1e-6.

Run:  python scripts/tpu_plane_large_test.py [512] [1024]
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
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def run(tag, fn, mk, reps=5):
        try:
            j = jax.jit(fn, donate_argnums=(0,))
            x = mk()
            gb = x.size * x.dtype.itemsize / 1e9
            t0 = time.perf_counter()
            y = j(x)
            sync(y)
            tc = time.perf_counter() - t0
            for _ in range(2):
                y = j(y)
            sync(y)
            t0 = time.perf_counter()
            sync(y)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                y = j(y)
            sync(y)
            t_loop = time.perf_counter() - t0
            dt = (t_loop - min(ts, 0.2 * t_loop)) / reps
            print(f"  {tag:36s} {dt * 1e3:9.3f} ms   "
                  f"({2 * gb / dt:6.0f} GB/s r+w eff, compile {tc:.0f}s)",
                  flush=True)
            del y
            return dt
        except Exception as e:                                # noqa: BLE001
            print(f"  {tag:36s} FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
            return None

    for n in [int(a) for a in (sys.argv[1:] or ['512', '1024'])]:
        print(f"== {n}^3 f32 planar ({n**3 * 8 / 2**30:.1f} GiB/volume)",
              flush=True)
        reps = 5 if n >= 1024 else 10

        def mk(nn=n):
            key = jax.random.PRNGKey(0)
            return jax.jit(lambda k: jax.random.uniform(
                k, (2, nn, nn, nn), jnp.float32, -0.5, 0.5))(key)

        # correctness: plane vs chained axis kernels on a small slab
        # (pre = 8: the axis kernels require pre % 8 == 0 for the mid axis)
        xs = jax.jit(lambda k: jax.random.uniform(
            k, (2, 8, n, n), jnp.float32, -0.5, 0.5))(jax.random.PRNGKey(1))
        ref = pb.fft_axis_p(pb.fft_axis_p(xs, 2, True), 1, True)
        got = pb.fft_plane_large_p(xs, True)
        err = float(jnp.max(jnp.abs(got - ref)) /
                    jnp.max(jnp.abs(ref)))
        print(f"  plane_large vs chained rel err: {err:.2e}", flush=True)

        run('chained axis1+axis2 (4 passes)',
            lambda q: pb.fft_axis_p(pb.fft_axis_p(q, 2, True), 1, True),
            mk, reps)
        run('plane_large (2 passes)',
            lambda q: pb.fft_plane_large_p(q, True), mk, reps)
        run('3-axis chained (6 passes)',
            lambda q: pb.fft_axis_p(
                pb.fft_axis_p(pb.fft_axis_p(q, 2, True), 1, True), 0, True),
            mk, reps)
        run('plane_large + axis0 (4 passes)',
            lambda q: pb.fft_axis_p(pb.fft_plane_large_p(q, True), 0, True),
            mk, reps)


if __name__ == '__main__':
    main()
