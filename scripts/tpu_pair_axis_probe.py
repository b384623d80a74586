"""Probe: long axes (N = 2048/4096) on the pair-kernel path.

Round 4's four-step measured 30.8 ms (479 GF/s) for a (2048, 512, 256)
lead pass and 41.7 ms (386 GF/s) for (4096, 256, 256) — 4-5x below the
axis-kernel rate, dominated by the outer combine/twiddle passes and the
(Q, R) interleave transpose.  Round 5 routes N = 2048 through ONE fused
2048-point pair-kernel pass (natural-order halves, no interleave) and
N = 4096 through a four-step whose inner kernel is the 2048 pair
(R = 2).  This measures the same configurations (VERDICT r4 target:
>= 800 GF/s at 2048).

Run:  python scripts/tpu_pair_axis_probe.py
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
    from mpi4py_fft_tpu.ops import matfft
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    rng = np.random.default_rng(5)

    # correctness on a small batch first
    for N in (2048, 4096):
        z = rng.standard_normal((N, 8, 128)) \
            + 1j * rng.standard_normal((N, 8, 128))
        p = jnp.asarray(np.stack([z.real, z.imag]).astype(np.float32))
        y = np.asarray(jax.device_get(
            jax.jit(lambda q: matfft.fft1d_p(q, 0, True))(p)))
        ref = np.fft.fft(z, axis=0)
        rel = np.linalg.norm((y[0] + 1j * y[1]) - ref) \
            / np.linalg.norm(ref)
        print(f"N={N} on-chip rel: {rel:.3e}", flush=True)
        assert rel < 5e-5, rel

    # round-4 comparison configs
    for shape, axis in (((2048, 512, 256), 0), ((4096, 256, 256), 0),
                        ((256, 512, 2048), 2)):
        N = shape[axis]
        x = jax.jit(lambda k: jax.random.uniform(
            k, (2,) + shape, jnp.float32, -0.5, 0.5))(jax.random.PRNGKey(1))
        f = jax.jit(lambda q: matfft.fft1d_p(q, axis, True),
                    donate_argnums=(0,))
        t0 = time.perf_counter()
        y = f(x)
        sync(y)
        print(f"{shape} ax{axis}: compiled+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        y = f(y)
        sync(y)
        t0 = time.perf_counter()
        sync(y)
        ts = time.perf_counter() - t0
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(y)
        sync(y)
        dt = (time.perf_counter() - t0 - ts) / reps
        flops = 5.0 * np.prod(shape) * np.log2(N)
        gb = 2 * 2 * np.prod(shape) * 4 / 1e9
        print(f"{shape} ax{axis}: {dt * 1e3:7.2f} ms  "
              f"{flops / dt / 1e9:7.1f} GF/s  "
              f"{gb / dt:6.1f} GB/s(2-pass-equiv)", flush=True)


if __name__ == '__main__':
    main()
