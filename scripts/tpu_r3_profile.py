"""Round-3 perf dissection: where do the ~27 ms of non-schedule overhead
at 1024^3 go, and what is the 512^3 anomaly?

The butterfly schedule is 2 HBM passes x 3 axes x 17.2 GB r+w ~= 51.6 GB
~= 63 ms at v5e's ~819 GB/s; BENCH_r02 measured 90.4 ms.  This script
times, at N in {512, 1024} (f32 planar volumes):

  * a pure copy kernel               (HBM speed-of-light reference)
  * each axis pass separately        (chained y = f(y), donated)
  * the summed axis passes vs the fused 3-axis forward
  * the fused forward+backward pair  (the bench's actual unit)
  * INPLACE on/off                   (protective-copy cost)

Run on hardware:  python scripts/tpu_r3_profile.py [512] [1024]
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
    from mpi4py_fft_tpu.ops import matfft
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def run(tag, fn, x, reps=5, donate=True):
        """Chained y = fn(y) timing with honest sync."""
        j = jax.jit(fn, donate_argnums=(0,) if donate else ())
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
        dt = max(time.perf_counter() - t0 - ts, 1e-9) / reps
        gb = x.size * x.dtype.itemsize / 1e9
        print(f"  {tag:36s} {dt * 1e3:9.3f} ms   "
              f"({2 * gb / dt:6.0f} GB/s r+w eff, compile {tc:.0f}s)",
              flush=True)
        return dt

    def copy_kernel(x):
        """Pure HBM copy via pallas: the speed-of-light reference."""
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...]
        B = x.shape[2] // 8
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(B,),
            in_specs=[pl.BlockSpec((2, x.shape[1], 8, x.shape[3]),
                                   lambda i: (0, 0, i, 0))],
            out_specs=pl.BlockSpec((2, x.shape[1], 8, x.shape[3]),
                                   lambda i: (0, 0, i, 0)),
        )(x)

    for n in [int(a) for a in (sys.argv[1:] or ['512', '1024'])]:
        print(f"== {n}^3 f32 planar ({n**3 * 8 / 2**30:.1f} GiB/volume)",
              flush=True)
        key = jax.random.PRNGKey(0)
        p = jax.jit(lambda k: jax.random.uniform(
            k, (2, n, n, n), jnp.float32, -0.5, 0.5))(key)
        reps = 5 if n >= 1024 else 10

        x4 = p.reshape(2, n, n * n // 128, 128)
        run('pure copy kernel', copy_kernel, x4, reps)
        del x4

        run('axis0 (lead)', lambda q: pb.fft_axis_p(q, 0, True), p, reps)
        run('axis1 (mid)', lambda q: pb.fft_axis_p(q, 1, True), p, reps)
        run('axis2 (last)', lambda q: pb.fft_axis_p(q, 2, True), p, reps)

        run('fused fwd (3 axes)',
            lambda q: pb.fft_axis_p(
                pb.fft_axis_p(pb.fft_axis_p(q, 2, True), 1, True), 0, True),
            p, reps)

        pfft = PlanarPFFT(None, (n, n, n), dtype='F')
        run('PlanarPFFT fwd', lambda q: pfft.forward_fn(q, True), p, reps)
        run('PlanarPFFT fwd+bwd pair',
            lambda q: pfft.backward_fn(pfft.forward_fn(q, True), False),
            p, reps)

        if os.environ.get('R3_INPLACE_AB', '0') == '1':
            pb._INPLACE = False
            jax.clear_caches()
            run('fused fwd INPLACE=off',
                lambda q: pb.fft_axis_p(
                    pb.fft_axis_p(pb.fft_axis_p(q, 2, True), 1, True),
                    0, True), p, reps)
            pb._INPLACE = True
            jax.clear_caches()
        del p


if __name__ == '__main__':
    main()
