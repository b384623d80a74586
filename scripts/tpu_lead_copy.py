"""Isolate the lead-axis kernel slowness: pure-copy Pallas kernels with
the exact block/grid structure of the lead vs mid FFT kernels, plus
butterfly-compute-only variants, timed on chip.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')
os.environ.setdefault('MPI4PY_FFT_TPU_PALLAS', 'off')

import numpy as np


def _make_bench(jax, p, reps):
    """Shared timing helper: compile once, subtract the sync/device_get
    overhead, average over reps (keeps main() and main2() comparable)."""
    def sync(v):
        return np.asarray(jax.device_get(v.ravel()[:1]))[0]

    def bench(tag, fn):
        j = jax.jit(fn)
        t0 = time.perf_counter()
        try:
            y = j(p)
            sync(y)
        except Exception as e:
            print(f"{tag:34s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return None
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(y)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = j(p)
        sync(y)
        dt = max(time.perf_counter() - t0 - ts, 1e-9) / reps
        print(f"{tag:34s} {dt * 1e3:8.3f} ms  (compile {tc:.0f}s)",
              flush=True)
        return dt
    return bench


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    n = int(os.environ.get('BENCH_N', 256))
    reps = int(os.environ.get('BENCH_REPS', 30))
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2, n, n, n)).astype(np.float32))

    def sync(v):
        return np.asarray(jax.device_get(v.ravel()[:1]))[0]

    bench = _make_bench(jax, p, reps)

    N = n
    SUB, LANE = 8, 128

    def copy_kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def bfly_kern(x_ref, tw_ref, o_ref):
        r, i = pb._butterfly(x_ref[0], x_ref[1], tw_ref, N, -1, None)
        o_ref[0] = r
        o_ref[1] = i

    tw_small = jnp.asarray(pb._tw_pack(N, -1, 'float32'))
    T = tw_small.shape[1]
    tw = jnp.broadcast_to(tw_small[:, :, None, None], (2, T, SUB, LANE))
    tw_spec = pb._bspec((2, T, SUB, LANE), lambda *g: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    # lead-structure copy: x (2, N, post/128, 128), block (2, N, 8, 128)
    def lead_copy(q):
        post = N * N
        x = q.reshape(2, N, post // LANE, LANE)
        out = pl.pallas_call(
            copy_kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(post // (SUB * LANE),),
            in_specs=[pb._bspec((2, N, SUB, LANE), lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM)],
            out_specs=pb._bspec((2, N, SUB, LANE), lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM),
        )(x)
        return out.reshape(q.shape)

    # mid-structure copy: x (2, pre, N, post), block (2, 8, N, 128)
    def mid_copy(q):
        out = pl.pallas_call(
            copy_kern,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(N // SUB, N // LANE),
            in_specs=[pb._bspec((2, SUB, N, LANE),
                                lambda i, j: (0, i, 0, j),
                                memory_space=pltpu.VMEM)],
            out_specs=pb._bspec((2, SUB, N, LANE),
                                lambda i, j: (0, i, 0, j),
                                memory_space=pltpu.VMEM),
        )(q)
        return out

    # lead-structure butterfly (exactly _kern_lead's compute)
    def lead_bfly(q):
        post = N * N
        x = q.reshape(2, N, post // LANE, LANE)
        out = pl.pallas_call(
            bfly_kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(post // (SUB * LANE),),
            in_specs=[pb._bspec((2, N, SUB, LANE), lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM), tw_spec],
            out_specs=pb._bspec((2, N, SUB, LANE), lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM),
        )(x, tw)
        return out.reshape(q.shape)

    # lead butterfly but gridded over a RESHAPED view that makes the
    # block's non-transform dims contiguous in HBM *and* the grid step
    # adjacent: x (2, N, post) viewed (2, N, G, 8, 128) with grid over G
    def lead_bfly_5d(q):
        post = N * N
        G = post // (SUB * LANE)
        x = q.reshape(2, N, G, SUB, LANE)
        out = pl.pallas_call(
            bfly_kern5,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(G,),
            in_specs=[pb._bspec((2, N, 1, SUB, LANE),
                                lambda i: (0, 0, i, 0, 0),
                                memory_space=pltpu.VMEM), tw_spec],
            out_specs=pb._bspec((2, N, 1, SUB, LANE),
                                lambda i: (0, 0, i, 0, 0),
                                memory_space=pltpu.VMEM),
        )(x, tw)
        return out.reshape(q.shape)

    def bfly_kern5(x_ref, tw_ref, o_ref):
        r, i = pb._butterfly(x_ref[0, :, 0], x_ref[1, :, 0], tw_ref, N, -1,
                             None)
        o_ref[0, :, 0] = r
        o_ref[1, :, 0] = i

    bench('copy lead-structure', lead_copy)
    bench('copy mid-structure', mid_copy)
    bench('bfly lead (as kernel)', lead_bfly)
    bench('bfly lead 5-D contiguous', lead_bfly_5d)


def main2():
    """Q-sweep: lead-axis butterfly with wider per-n contiguous chunks."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    n = int(os.environ.get('BENCH_N', 256))
    reps = int(os.environ.get('BENCH_REPS', 30))
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2, n, n, n)).astype(np.float32))
    N = n
    LANE = 128
    bench = _make_bench(jax, p, reps)

    tw_small = jnp.asarray(pb._tw_pack(N, -1, 'float32'))
    T = tw_small.shape[1]

    def make_leadQ(Q, vmem_mb):
        S = Q // LANE
        twq = jnp.broadcast_to(tw_small[:, :, None, None], (2, T, S, LANE))
        twq_spec = pb._bspec((2, T, S, LANE), lambda *g: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        def kern(x_ref, tw_ref, o_ref):
            xr = x_ref[0].reshape(N, Q // LANE, LANE)
            xi = x_ref[1].reshape(N, Q // LANE, LANE)
            r, i = pb._butterfly(xr, xi, tw_ref, N, -1, None)
            o_ref[0] = r.reshape(N, Q)
            o_ref[1] = i.reshape(N, Q)

        def fn(q):
            post = N * N
            x = q.reshape(2, N, post)
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                grid=(post // Q,),
                in_specs=[pb._bspec((2, N, Q), lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM), twq_spec],
                out_specs=pb._bspec((2, N, Q), lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_mb * 2 ** 20),
            )(x, twq)
            return out.reshape(q.shape)
        return fn

    for Q, mb in ((2048, 64), (4096, 100), (8192, 128), (16384, 128)):
        bench(f'bfly lead Q={Q}', make_leadQ(Q, mb))


if __name__ == '__main__':
    main2() if os.environ.get('LEAD_Q') == '1' else main()
