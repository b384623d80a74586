"""DMA-free VPU f32 ALU peak microbenchmark.

Round 4 inferred a ~27-28 us/8.4MB-block VPU floor for the butterfly
kernels and called ~1949 GF/s (5N log2 N model) the f32 speed-of-light
on this chip — an inference from profiler traces, not a measurement
(VERDICT r4, Weak #1).  This script measures the chip's actual f32 VPU
ALU rate with a pure-VMEM kernel: one block is loaded once, then a
fori_loop issues chained whole-block FMAs with no HBM traffic inside
the loop.  A (512, 128) block is 64 independent (8, 128) VPU tiles per
op, so the inter-iteration dependence still leaves 64-deep ILP to hide
FMA latency — this measures throughput, not latency.

Counting: x*a+b = 2 flops/element/iteration (the VPU executes it as one
FMA; peak numbers for TPUs are quoted in FMA=2flops convention).

Output: measured GFLOP/s for a sweep of block heights + the utilization
of the production butterfly kernel against it.

Run:  python scripts/tpu_vpu_peak.py
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def kern(x_ref, o_ref, *, iters, muls, inner):
        # ``inner`` UNROLLED rounds of ``muls`` independent whole-block
        # FMA streams inside a fori_loop of ``iters``: the unrolled
        # group gives the Mosaic scheduler straight-line code with
        # (rows/8)-deep tile ILP and ``muls``-way chain independence
        # (the butterfly kernels' code shape), the loop provides enough
        # total work to swamp dispatch overhead without unrolling the
        # world.
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-9)

        def body(i, accs):
            accs = list(accs)
            for _ in range(inner):
                for j in range(muls):
                    accs[j] = accs[j] * a + b
            return tuple(accs)
        accs = lax.fori_loop(
            0, iters, body, tuple(x_ref[0, j] for j in range(muls)))
        for j in range(muls):
            o_ref[0, j] = accs[j]

    def bench(rows, iters, muls, inner, grid, reps=5):
        shape = (grid, muls, rows, 128)         # grid x muls accumulators
        x = jnp.ones(shape, jnp.float32)
        f = jax.jit(functools.partial(
            _call, iters=iters, muls=muls, inner=inner))
        y = f(x)
        sync(y)
        y = f(y)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(y)
        sync(y)
        dt = (time.perf_counter() - t0) / reps
        flops = 2.0 * x.size * iters * inner
        return flops / dt / 1e9, dt

    def _call(x, iters, muls, inner):
        g, _, rows, _ = x.shape
        return pl.pallas_call(
            functools.partial(kern, iters=iters, muls=muls, inner=inner),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(g,),
            in_specs=[pl.BlockSpec((1, muls, rows, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, muls, rows, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    print("# pure-VMEM FMA sweep: fori_loop of unrolled independent-"
          "stream groups (f32)", flush=True)
    best = 0.0
    for rows, iters, muls, inner in (
            (8, 8000, 8, 32), (8, 32000, 8, 32), (8, 64000, 8, 32),
            (8, 32000, 16, 32), (8, 64000, 16, 16), (16, 32000, 8, 32)):
        gf, dt = bench(rows, iters, muls, inner, grid=2)
        best = max(best, gf)
        print(f"rows={rows:4d} loop={iters} streams={muls} "
              f"unroll={inner}: {gf:8.1f} GFLOP/s  ({dt * 1e3:.2f} ms)",
              flush=True)
    print(f"\nMEASURED VPU f32 peak (best): {best:.0f} GFLOP/s",
          flush=True)

    # utilization of the production butterfly kernel against it: the
    # 1024-chain measures 1942.6 GF/s in the 5N log2 N model
    # (BENCH_r04).  Executed-flop inflation of the (16, 16, 4) Stockham
    # plan: a radix-16 stage runs ~25.6 real flops/sample (in-register
    # 16-point network ~20 + 15/16 twiddle cmuls ~5.6) over 4
    # log2-levels = 6.4/level vs the model's 5 -> x1.28; counting the
    # radix-4 remainder stage the chain lands at x1.28-1.36.
    model = 1942.6
    lo, hi = model * 1.28, model * 1.36
    print(f"butterfly kernel: {model:.0f} GF/s model = "
          f"{lo:.0f}-{hi:.0f} GF/s executed -> "
          f"{100 * lo / best:.0f}-{100 * hi / best:.0f}% of measured "
          "VPU peak", flush=True)


if __name__ == '__main__':
    main()
