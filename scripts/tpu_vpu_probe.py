"""Pure in-kernel butterfly COMPUTE cost, separated from HBM DMA.

Runs the lead-axis kernel with the butterfly applied k times per block
(k = 1, 2, 3) and slope-fits over k: the slope is the pure VPU compute
per butterfly per block, the intercept the DMA + fixed cost.  Decides
whether the out-of-place DMA rate (903-1019 GB/s measured,
scripts/tpu_blockshape_probe.py) is exploitable: if compute/butterfly
~= the in-place DMA (26-28 us/8.4 MB block) the kernel is at its dual
roofline and OOP buys nothing; if compute is ~20 us or less, an
out-of-place pass schedule is worth building.

Run:  python scripts/tpu_vpu_probe.py [1024]
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

    def kern(x_ref, tw_ref, o_ref, *, N, reps):
        r, i = x_ref[0], x_ref[1]
        for _ in range(reps):
            r, i = pb._butterfly(r, i, tw_ref, N, -1, None)
        o_ref[0] = r
        o_ref[1] = i

    def mk(reps, inplace=True):
        tw_small = jnp.asarray(pb._tw_pack(n, -1, 'float32'))
        tw = jnp.broadcast_to(tw_small[:, :, None, None],
                              (2, tw_small.shape[1], 8, 128))
        tw_spec = pb._bspec((2, tw_small.shape[1], 8, 128),
                            lambda *g: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

        def f(x):
            return pl.pallas_call(
                functools.partial(kern, N=n, reps=reps),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                grid=(n // 8, n // 128),
                in_specs=[pb._bspec((2, n, 8, 128),
                                    lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM), tw_spec],
                out_specs=pb._bspec((2, n, 8, 128),
                                    lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM),
                input_output_aliases={0: 0} if inplace else {},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 2 ** 20),
            )(x, tw)
        return f

    key = jax.random.PRNGKey(0)
    gb2 = 2 * 2 * n ** 3 * 4 / 1e9

    def timed(mk_pass):
        """One full volume pass, chained 1 vs 5 inside a jit (slope)."""
        ts = {}
        for k in (1, 5):
            def f(x, kk=k):
                for _ in range(kk):
                    x = mk_pass(x)
                return x
            j = jax.jit(f, donate_argnums=(0,))
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
        return (ts[5] - ts[1]) / 4

    rows = {}
    for reps in (1, 2, 3):
        try:
            b = timed(mk(reps))
            rows[reps] = b
            print(f"inplace bfly x{reps}: per-pass {b*1e3:7.3f} ms "
                  f"({gb2 / b:6.0f} GB/s r+w)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"bfly x{reps}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    if 1 in rows and 3 in rows:
        slope = (rows[3] - rows[1]) / 2
        print(f"pure compute per butterfly: {slope*1e3:7.3f} ms/pass "
              f"({slope*1e6/(n//8*n//128):6.2f} us/block); "
              f"DMA+fixed intercept {max(rows[1]-slope,0)*1e3:7.3f} ms",
              flush=True)
    # out-of-place single butterfly at n <= 512 (2 live volumes)
    if n <= 512:
        try:
            b = timed(mk(1, inplace=False))
            print(f"OOP bfly x1: per-pass {b*1e3:7.3f} ms "
                  f"({gb2 / b:6.0f} GB/s r+w)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"OOP bfly x1: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == '__main__':
    main()
