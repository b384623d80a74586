"""What caps HBM bandwidth at ~500-620 GB/s? A/B pure copies:

  xla-copy         — jnp copy via XLA (out of place)
  pallas contig    — (2,1,N,N) contiguous 8 MB blocks, out of place
  pallas contig ip — same, input_output_aliases (in-place r+w)
  pallas lead      — (2,N,8,128) strided blocks, out of place
  pallas lead ip   — same, in-place
  grid order       — lead blocking, 1-D vs 2-D grid

Run:  python scripts/tpu_dma_probe.py [1024]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def run(tag, fn, shape, reps=5, donate=True):
        try:
            j = jax.jit(fn, donate_argnums=(0,) if donate else ())
            key = jax.random.PRNGKey(0)
            x = jax.jit(lambda k: jax.random.uniform(
                k, shape, jnp.float32, -0.5, 0.5))(key)
            gb = x.size * x.dtype.itemsize / 1e9
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
            print(f"  {tag:34s} {dt * 1e3:9.3f} ms  "
                  f"({2 * gb / dt:6.0f} GB/s r+w)", flush=True)
            del y
            return dt
        except Exception as e:                                # noqa: BLE001
            print(f"  {tag:34s} FAILED {type(e).__name__}: {str(e)[:110]}",
                  flush=True)
            return None

    def k_copy(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def pallas_copy(block, imap, grid, alias, vmem=120):
        def f(x):
            return pl.pallas_call(
                k_copy,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                grid=grid,
                in_specs=[pb._bspec(block, imap,
                                    memory_space=pltpu.VMEM)],
                out_specs=pb._bspec(block, imap,
                                    memory_space=pltpu.VMEM),
                input_output_aliases={0: 0} if alias else {},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem * 2 ** 20),
            )(x)
        return f

    shape3 = (2, n, n, n)
    print(f"== DMA probes at {n}^3 planar f32 "
          f"({n**3 * 8 / 2**30:.1f} GiB/volume)", flush=True)

    run('xla copy (oop)', lambda x: x + 0.0, shape3, donate=False)
    run('xla copy (donated)', lambda x: x + 0.0, shape3)

    # contiguous plane blocks (2, 1, N, N)
    for alias, tag in [(False, 'plane contig oop'),
                       (True, 'plane contig in-place')]:
        run(tag, pallas_copy((2, 1, n, n), lambda i: (0, i, 0, 0), (n,),
                             alias), shape3, donate=alias)

    # lead blocking (2, N, 8, 128) over native 4-D, 2-D grid
    for alias, tag in [(False, 'lead strided oop'),
                       (True, 'lead strided in-place')]:
        run(tag, pallas_copy((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                             (n // 8, n // 128), alias), shape3,
            donate=alias)

    # bigger contiguous chunks: (2, 8, N, N) = 64 MB blocks
    run('8-plane contig in-place',
        pallas_copy((2, 8, n, n), lambda i: (0, i, 0, 0), (n // 8,), True,
                    vmem=200), shape3)

    # sublane-major grid order for lead blocking
    run('lead strided ip (swapped grid)',
        pallas_copy((2, n, 8, 128), lambda j, i: (0, 0, i, j),
                    (n // 128, n // 8), True), shape3)


if __name__ == '__main__':
    main()
