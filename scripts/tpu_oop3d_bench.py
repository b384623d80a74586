"""Chained quartered OOP 3-D c2c at the north-star size (ops/oop3d.py).

Mirrors bench.py's production shape: `chain` normalized-forward /
backward pairs fused in ONE jitted call on donated quarter buffers.

Run:  python scripts/tpu_oop3d_bench.py [1024] [chain]
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
    from mpi4py_fft_tpu.ops import oop3d

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    N = (n, n, n)
    assert oop3d.supported_q(N, np.float32)
    vol = float(np.prod(N))
    scale = 1.0 / vol

    def step(*qs):
        for _ in range(chain):
            qs = oop3d.fft3_q(qs, True, scale=scale)
            qs = oop3d.fft3_q(qs, False, scale=None)
        return qs

    f = jax.jit(step, donate_argnums=(0, 1, 2, 3))

    def sync(qs):
        return float(np.asarray(jax.device_get(qs[0][(0, 0, 0, 0)])))

    key = jax.random.PRNGKey(0)
    qshape = (2, n // 2, n, n // 2)
    mk = jax.jit(lambda k: tuple(
        jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
        for kk in jax.random.split(k, 4)))
    qs = mk(key)
    print(f"# {n}^3 quartered: compiling...", flush=True)
    t0 = time.perf_counter()
    qs = f(*qs)
    sync(qs)
    print(f"# compile+first {time.perf_counter() - t0:.0f}s", flush=True)
    for _ in range(2):
        qs = f(*qs)
    sync(qs)
    t0 = time.perf_counter()
    sync(qs)
    ts = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        qs = f(*qs)
    sync(qs)
    t_loop = time.perf_counter() - t0
    dt = (t_loop - min(ts, 0.2 * t_loop)) / (reps * 2 * chain)
    flops = 5.0 * vol * np.log2(vol)
    print(f"quartered {n}^3 c2c: {dt*1e3:8.3f} ms/transform  "
          f"{flops / dt / 1e9:7.1f} GFLOP/s", flush=True)

    # correctness anchor vs the in-place full-volume pipeline at a
    # host-checkable size
    m = 256
    x = np.random.default_rng(1).standard_normal(
        (2, m, m, m)).astype(np.float32)
    qs2 = oop3d.split_q(jnp.asarray(x))
    ys = oop3d.fft3_q(qs2, True, scale=None)
    y = np.asarray(oop3d.assemble_q(ys))
    ref = np.fft.fftn(x[0] + 1j * x[1], axes=(0, 1, 2))
    got = y[0] + 1j * y[1]
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"correctness vs numpy at {m}^3: rel {rel:.2e}", flush=True)
    assert rel < 1e-5


if __name__ == '__main__':
    main()
