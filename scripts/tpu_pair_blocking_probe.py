"""2-in/2-out DMA-rate probe: find a pair blocking that restores
single-stream OOP rates (~1000 GB/s r+w) for the quartered schedule's
x/z passes (currently ~681 GB/s; docs/benchmarks.md).

Pure COPY kernels (no butterfly) on quarter shapes at 1024^3 —
isolates the 4-stream pipeline cost.  Variants:
  base   — production blocking (2, h, 8, 128), 2-D grid
  wide   — (2, h, 8, 256) blocks: 8 KB HBM chunks
  tall   — (2, h, 16, 128) blocks
  grid1  — 1-D grid (lane-major collapsed)
  gridT  — 2-D grid transposed iteration order
  single — 1-in/1-out copy with the same block (reference rate)
  dual2  — TWO 1-in/1-out pallas calls (a->oa, b->ob): 2 streams per
           call, tests whether stream count per call is the binding
           constraint
Run:  python scripts/tpu_pair_blocking_probe.py [1024]
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
    from mpi4py_fft_tpu.ops.pallas_butterfly import _bspec

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = n // 2
    qshape = (2, h, n, h)               # x-half quarter, planar
    qbytes = int(np.prod(qshape)) * 4
    gb_pass = 4 * qbytes / 1e9          # 2 quarters r+w per pair call

    def sync(t):
        v = t[0] if isinstance(t, (tuple, list)) else t
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    key = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k: tuple(
        jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
        for kk in jax.random.split(k, 2)))

    def kcopy2(xa, xb, oa, ob):
        oa[...] = xa[...]
        ob[...] = xb[...]

    def kcopy1(xa, oa):
        oa[...] = xa[...]

    def mkpair(block, imap, grid, vmem_mb=120):
        spec = _bspec(block, imap, memory_space=pltpu.VMEM)

        def f(a, b):
            return pl.pallas_call(
                kcopy2,
                out_shape=(jax.ShapeDtypeStruct(qshape, jnp.float32),) * 2,
                grid=grid,
                in_specs=[spec, spec],
                out_specs=(spec, spec),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_mb * 2 ** 20),
            )(a, b)
        return f

    variants = {}
    # production blocking: (2, h, 8, 128), grid (n/8, h/128)
    variants['base 2d (2,h,8,128)'] = mkpair(
        (2, h, 8, 128), lambda i, j: (0, 0, i, j), (n // 8, h // 128))
    variants['wide (2,h,8,256)'] = mkpair(
        (2, h, 8, 256), lambda i, j: (0, 0, i, j), (n // 8, h // 256))
    variants['tall (2,h,16,128)'] = mkpair(
        (2, h, 16, 128), lambda i, j: (0, 0, i, j), (n // 16, h // 128))
    variants['gridT (j-major)'] = mkpair(
        (2, h, 8, 128), lambda j, i: (0, 0, i, j), (h // 128, n // 8))
    variants['halfrow (2,h/2,8,128)'] = mkpair(
        (2, h // 2, 8, 128), lambda k, i, j: (0, k, i, j),
        (2, n // 8, h // 128))

    def single(a, b):
        spec = _bspec((2, h, 8, 128), lambda i, j: (0, 0, i, j),
                      memory_space=pltpu.VMEM)
        out = []
        for x in (a, b):
            out.append(pl.pallas_call(
                kcopy1,
                out_shape=jax.ShapeDtypeStruct(qshape, jnp.float32),
                grid=(n // 8, h // 128),
                in_specs=[spec],
                out_specs=spec,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 2 ** 20),
            )(x))
        return tuple(out)
    variants['dual 1-in calls'] = single

    def probe(tag, f):
        try:
            ts = {}
            for k in (1, 4):
                def g(a, b, kk=k):
                    for _ in range(kk):
                        a, b = f(a, b)
                    return a, b
                j = jax.jit(g, donate_argnums=(0, 1))
                st = mk(key)
                st = j(*st)
                sync(st)
                st = j(*st)
                sync(st)
                t0 = time.perf_counter()
                for _ in range(3):
                    st = j(*st)
                sync(st)
                ts[k] = (time.perf_counter() - t0) / 3
                del st
            per = (ts[4] - ts[1]) / 3
            print(f"  {tag:28s} {per*1e3:8.3f} ms/pair-call "
                  f"({gb_pass/per:6.0f} GB/s r+w)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  {tag:28s} FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    print(f"== pair-copy blocking probe at {n}^3 quarters "
          f"({gb_pass:.1f} GB/pair-call)", flush=True)
    only = os.environ.get('PROBE_ONLY', '')
    for tag, f in variants.items():
        if only and only != tag:
            continue
        probe(tag, f)


if __name__ == '__main__':
    main()
