"""Copy bandwidth vs block shape at 1024^3 (slope-fitted, in-place).

HBM layout of a (2, n, n, n) f32 array is (8, 128)-tiled row-major on
the last two dims: a (8, 256) block row = two adjacent tiles = 8 KB
contiguous; (16, 128) = two tiles 32 KB apart.  Chunk contiguity sets
DMA efficiency.

Run:  python scripts/tpu_blockshape_probe.py [1024]
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

    def probe(tag, mk_pass):
        try:
            ts = {}
            for k in (1, 5):
                def f(x, kk=k):
                    for _ in range(kk):
                        x = mk_pass(x)
                    return x
                j = jax.jit(f, donate_argnums=(0,))
                key = jax.random.PRNGKey(0)
                x = jax.jit(lambda kq: jax.random.uniform(
                    kq, (2, n, n, n), jnp.float32, -0.5, 0.5))(key)
                y = j(x)
                sync(y)
                for _ in range(2):
                    y = j(y)
                sync(y)
                t0 = time.perf_counter()
                for _ in range(3):
                    y = j(y)
                sync(y)
                ts[k] = (time.perf_counter() - t0) / 3
                del y
            b = (ts[5] - ts[1]) / 4
            gb2 = 2 * 2 * n ** 3 * 4 / 1e9
            print(f"  {tag:34s} per-pass {b*1e3:7.3f} ms "
                  f"({gb2 / b:6.0f} GB/s r+w)", flush=True)
        except Exception as e:                                # noqa: BLE001
            print(f"  {tag:34s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    def k_copy(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def copy(block, imap, grid, vmem=120):
        def f(x):
            return pl.pallas_call(
                k_copy,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                grid=grid,
                in_specs=[pb._bspec(block, imap,
                                    memory_space=pltpu.VMEM)],
                out_specs=pb._bspec(block, imap,
                                    memory_space=pltpu.VMEM),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem * 2 ** 20),
            )(x)
        return f

    print(f"== copy-vs-blockshape at {n}^3 planar f32", flush=True)
    probe('lead (2,N,8,128) 4KB chunks',
          copy((2, n, 8, 128), lambda i, j: (0, 0, i, j),
               (n // 8, n // 128)))
    probe('lead (2,N,8,256) 8KB chunks',
          copy((2, n, 8, 256), lambda i, j: (0, 0, i, j),
               (n // 8, n // 256)))
    probe('lead (2,N,8,512) 16KB chunks',
          copy((2, n, 8, 512), lambda i, j: (0, 0, i, j),
               (n // 8, n // 512), vmem=110))
    probe('lead (2,N,16,128) 2x4KB strided',
          copy((2, n, 16, 128), lambda i, j: (0, 0, i, j),
               (n // 16, n // 128)))
    probe('plane (2,1,N,N) 4MB contig',
          copy((2, 1, n, n), lambda i: (0, i, 0, 0), (n,)))
    probe('2-plane (2,2,N,N) 8MB contig',
          copy((2, 2, n, n), lambda i: (0, i, 0, 0), (n // 2,), vmem=110))
    probe('halfplane (2,1,N//2,N)',
          copy((2, 1, n // 2, n), lambda i, j: (0, i, j, 0),
               (n, 2)))

    # out-of-place (no aliasing): measures whether the in-place r+w rate
    # is an HBM limit or an aliasing artifact.  Needs 2 live volumes, so
    # it only fits HBM at n <= 512 (2 x 2.15 GB).
    if n <= 512:
        def copy_oop(block, imap, grid):
            def f(x):
                return pl.pallas_call(
                    k_copy,
                    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    grid=grid,
                    in_specs=[pb._bspec(block, imap,
                                        memory_space=pltpu.VMEM)],
                    out_specs=pb._bspec(block, imap,
                                        memory_space=pltpu.VMEM),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=120 * 2 ** 20),
                )(x)
            return f
        probe('OOP plane (2,1,N,N)',
              copy_oop((2, 1, n, n), lambda i: (0, i, 0, 0), (n,)))
        probe('OOP lead (2,N,8,128)',
              copy_oop((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                       (n // 8, n // 128)))


if __name__ == '__main__':
    main()
