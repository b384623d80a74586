"""Dissect the in-kernel cost of the Stockham butterfly at N=1024:
arithmetic (twiddle mults) vs state movement (stage concats) vs DMA.

Variants, all on the lead-axis blocking (2, N, 8, 128):
  copy        — o = x (DMA floor)
  concat-only — 5 stages of slice+concat, no arithmetic (move cost)
  adds-only   — butterfly with twiddles replaced by pass-through
  full        — the real radix-4 butterfly
  radix16     — two radix-4 layers fused per concat (3 concats not 5)

Run:  python scripts/tpu_bfly_dissect.py [1024]
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

    def run(tag, fn, reps=5):
        try:
            j = jax.jit(fn, donate_argnums=(0,))
            key = jax.random.PRNGKey(0)
            x = jax.jit(lambda k: jax.random.uniform(
                k, (2, n, n * n // 128, 128), jnp.float32, -0.5, 0.5))(key)
            gb = x.size * x.dtype.itemsize / 1e9
            t0 = time.perf_counter()
            y = j(x)
            sync(y)
            tc = time.perf_counter() - t0
            for _ in range(2):
                y = j(y)
            sync(y)
            t0 = time.perf_counter()
            for _ in range(reps):
                y = j(y)
            sync(y)
            dt = (time.perf_counter() - t0) / reps
            print(f"  {tag:30s} {dt * 1e3:9.3f} ms  "
                  f"({2 * gb / dt:6.0f} GB/s r+w, compile {tc:.0f}s)",
                  flush=True)
            del y
            return dt
        except Exception as e:                                # noqa: BLE001
            print(f"  {tag:30s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None

    def mk_kernel(body):
        """Lead-axis pallas_call around ``body(xr, xi) -> (r, i)``."""
        def kern(x_ref, o_ref):
            r, i = body(x_ref[0], x_ref[1])
            o_ref[0] = r
            o_ref[1] = i

        def f(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                grid=(x.shape[2] // 8, x.shape[3] // 128),
                in_specs=[pb._bspec((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM)],
                out_specs=pb._bspec((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 2 ** 20),
            )(x)
        return f

    def body_copy(xr, xi):
        return xr, xi

    def body_concat(xr, xi):
        # Stockham data flow without arithmetic: 5 radix-4 stages of
        # slice + concat on the (L, M, 8, 128) state
        xr = xr[:, None]
        xi = xi[:, None]
        L = n
        while L > 1:
            Lq = L // 4
            xr = jnp.concatenate([xr[:Lq], xr[Lq:2 * Lq],
                                  xr[2 * Lq:3 * Lq], xr[3 * Lq:]], axis=1)
            xi = jnp.concatenate([xi[:Lq], xi[Lq:2 * Lq],
                                  xi[2 * Lq:3 * Lq], xi[3 * Lq:]], axis=1)
            L = Lq
        return xr[0], xi[0]

    def body_adds(xr, xi):
        # radix-4 butterfly arithmetic with twiddles skipped
        xr = xr[:, None]
        xi = xi[:, None]
        L = n
        while L > 1:
            Lq = L // 4
            q0r, q1r = xr[:Lq], xr[Lq:2 * Lq]
            q2r, q3r = xr[2 * Lq:3 * Lq], xr[3 * Lq:]
            q0i, q1i = xi[:Lq], xi[Lq:2 * Lq]
            q2i, q3i = xi[2 * Lq:3 * Lq], xi[3 * Lq:]
            t0r, t0i = q0r + q2r, q0i + q2i
            t1r, t1i = q1r + q3r, q1i + q3i
            t2r, t2i = q0r - q2r, q0i - q2i
            t3r, t3i = q1r - q3r, q1i - q3i
            u3r, u3i = t3i, -t3r
            xr = jnp.concatenate([t0r + t1r, t2r + u3r,
                                  t0r - t1r, t2r - u3r], axis=1)
            xi = jnp.concatenate([t0i + t1i, t2i + u3i,
                                  t0i - t1i, t2i - u3i], axis=1)
            L = Lq
        return xr[0], xi[0]

    dtype_str = 'float32'
    tw_np = pb._tw_pack(n, -1, dtype_str)

    def body_full(xr, xi, tw):
        return pb._butterfly(xr, xi, tw, n, -1)

    def with_tw(body):
        tw_small = jnp.asarray(tw_np)
        tw = jnp.broadcast_to(tw_small[:, :, None, None],
                              (2, tw_small.shape[1], 8, 128))
        tw_spec = pb._bspec((2, tw_small.shape[1], 8, 128),
                            lambda *g: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

        def kern(x_ref, tw_ref, o_ref):
            r, i = body(x_ref[0], x_ref[1], tw_ref)
            o_ref[0] = r
            o_ref[1] = i

        def f(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                grid=(x.shape[2] // 8, x.shape[3] // 128),
                in_specs=[pb._bspec((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM), tw_spec],
                out_specs=pb._bspec((2, n, 8, 128), lambda i, j: (0, 0, i, j),
                                    memory_space=pltpu.VMEM),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 2 ** 20),
            )(x, tw)
        return f

    print(f"== lead-axis kernel dissection at N={n} "
          f"(volume {n**3 * 8 / 2**30:.1f} GiB)", flush=True)
    run('copy (DMA floor)', mk_kernel(body_copy))
    run('concat-only (moves)', mk_kernel(body_concat))
    run('adds-only (no twiddles)', mk_kernel(body_adds))
    run('full radix-4 butterfly', with_tw(body_full))


if __name__ == '__main__':
    main()
