"""Probe: do the fused butterfly kernels compile and win at N=512/1024?

_MAX_N is 256 ("VMEM bound").  The 1024^3 north-star OOMs on the
four-step einsum fallback (16 GB HLO temp vs 15.75 GB HBM), so the fix
is native long-N kernels + in-place aliasing.  This measures, per axis
variant and N in {512, 1024}:
  * compile success at raised vmem limits
  * correctness vs numpy on a small batch
  * ms + GB/s on a ~1 GB volume
  * the same with input_output_aliases (in-place HBM update)

Run on hardware:  python scripts/tpu_longN_probe.py
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

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def run(tag, fn, x, reps=10):
        """Chained y = fn(y): in/out shapes match, so this times both the
        donated (aliased) and plain cases without reusing a dead buffer."""
        nbytes = x.nbytes
        try:
            t0 = time.perf_counter()
            y = fn(x)
            sync(y)
            tc = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{tag:44s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            return None
        t0 = time.perf_counter()
        sync(y)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        sync(y)
        dt = max(time.perf_counter() - t0 - ts, 1e-9) / reps
        gbs = 2 * nbytes / dt / 1e9
        print(f"{tag:44s} {dt * 1e3:8.3f} ms  {gbs:6.0f} GB/s  "
              f"(compile {tc:.0f}s)", flush=True)
        return dt

    rng = np.random.default_rng(0)
    VMEM = int(os.environ.get('VMEM_MB', 100)) * 2 ** 20

    def mk(kern, N, block, grid, imap, twk, alias):
        tw_small = jnp.asarray(pb._tw_pack(N, -1, 'float32'))
        T = tw_small.shape[1]
        tw = jnp.broadcast_to(tw_small[:, :, None, None], (2, T, 8, 128))
        tw_spec = pb._bspec((2, T, 8, 128), lambda *g: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

        def fn(x):
            out = pl.pallas_call(
                functools.partial(kern, N=N, sign=-1, scale=None),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                grid=grid(x),
                in_specs=[pb._bspec(block, imap,
                                    memory_space=pltpu.VMEM), tw_spec],
                out_specs=pb._bspec(block, imap, memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
                input_output_aliases={0: 0} if alias else {},
            )(x, tw)
            return out
        return jax.jit(fn, donate_argnums=(0,) if alias else ())

    for N in (512, 1024):
        # correctness on a small batch: lead variant (2, N, 8, 128)
        xs = (rng.standard_normal((N, 1024)) +
              1j * rng.standard_normal((N, 1024)))
        ref = np.fft.fft(xs, axis=0)
        for alias in (False, True):
            f = mk(pb._kern_lead, N, (2, N, 8, 128),
                   lambda x: (x.shape[2] // 8,), lambda i: (0, 0, i, 0),
                   None, alias)
            p = jnp.asarray(np.stack([xs.real, xs.imag])
                            .astype(np.float32).reshape(2, N, 8, 128))
            try:
                got = np.asarray(f(p)).reshape(2, N, 1024)
            except Exception as e:  # noqa: BLE001
                print(f"lead N={N} alias={alias} FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            g = got[0] + 1j * got[1]
            rel = np.linalg.norm(g - ref) / np.linalg.norm(ref)
            print(f"lead N={N} alias={alias}: rel {rel:.2e}", flush=True)

        # timing on ~1 GB volumes
        rows = (1 << 28) // N // 1024 * 1024        # ~2^28 f32 per plane
        x = jnp.asarray(rng.random((2, N, rows // 128, 128),
                                   dtype=np.float32))
        for alias in (False, True):
            f = mk(pb._kern_lead, N, (2, N, 8, 128),
                   lambda x: (x.shape[2] // 8,), lambda i: (0, 0, i, 0),
                   None, alias)
            run(f"lead  N={N} alias={int(alias)}", f,
                jnp.copy(x) if alias else x)

        xm = jnp.asarray(rng.random((2, 8 * (rows // 1024), N, 128),
                                    dtype=np.float32))
        for alias in (False, True):
            f = mk(pb._kern_mid, N, (2, 8, N, 128),
                   lambda x: (x.shape[1] // 8, 1),
                   lambda i, j: (0, i, 0, j), None, alias)
            run(f"mid   N={N} alias={int(alias)}", f,
                jnp.copy(xm) if alias else xm)

        xl = jnp.asarray(rng.random((2, rows, N), dtype=np.float32))
        for alias in (False, True):
            f = mk(pb._kern_last, N, (2, 1024, N),
                   lambda x: (x.shape[1] // 1024,), lambda i: (0, i, 0),
                   None, alias)
            run(f"last  N={N} alias={int(alias)}", f,
                jnp.copy(xl) if alias else xl)
        for alias in (False, True):
            f = mk(pb._kern_last2, N, (2, 8, 128, N),
                   lambda x: (x.shape[1] // 8, 1),
                   lambda i, j: (0, i, 0, j), None, alias)
            xl2 = jnp.asarray(rng.random((2, 8 * (rows // 1024), 128, N),
                                         dtype=np.float32))
            run(f"last2 N={N} alias={int(alias)}", f, xl2)

    # reference point: N=256 lead kernel on the same volume
    N = 256
    rows = (1 << 28) // N // 1024 * 1024
    x = jnp.asarray(rng.random((2, N, rows // 128, 128), dtype=np.float32))
    f = mk(pb._kern_lead, N, (2, N, 8, 128),
           lambda x: (x.shape[2] // 8,), lambda i: (0, 0, i, 0), None, False)
    run("lead  N=256 alias=0 (reference)", f, x)


if __name__ == '__main__':
    main()
