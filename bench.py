"""Benchmark: 3-D c2c FFT GFLOP/s/chip (5N*log2N flop model).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup over single-process numpy (pocketfft) on the
host CPU — the closest stand-in for the reference's FFTW-backed serial
path on this machine (reference perf surface: tests/test_speed.py).
"""
import json
import os
import sys
import time

# real-chip precision tier: f32/c64 (f64 is emulated on TPU)
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mpi4py_fft_tpu import PFFT

    n = int(os.environ.get('BENCH_N', 512))
    reps = int(os.environ.get('BENCH_REPS', 5))
    N = (n, n, n)
    ntot = float(np.prod(N))
    flops = 5.0 * ntot * np.log2(ntot)  # 5N*log2(N) model (BASELINE.json)

    fft = PFFT(None, N, dtype='F', collapse=False)
    fwd = jax.jit(lambda x: fft.forward.fn(x, normalize=False))

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal(N) +
                     1j * rng.standard_normal(N)).astype(np.complex64))
    y = fwd(x)
    y.block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fwd(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    gflops = flops / dt / 1e9

    # correctness anchor on a small sub-problem
    m = 64
    xs = jnp.asarray((rng.standard_normal((m, m, m)) +
                      1j * rng.standard_normal((m, m, m))).astype(np.complex64))
    ffts = PFFT(None, (m, m, m), dtype='F')
    ys = np.asarray(jax.jit(lambda v: ffts.forward.fn(v, normalize=False))(xs))
    ref = np.fft.fftn(np.asarray(xs))
    rel = float(np.linalg.norm(ys - ref) / np.linalg.norm(ref))
    assert rel < 1e-4, f"correctness check failed: rel err {rel}"

    # numpy host baseline (1 rep; pocketfft)
    xn = np.asarray(x)
    t0 = time.perf_counter()
    _ = np.fft.fftn(xn)
    dt_np = time.perf_counter() - t0
    gflops_np = flops / dt_np / 1e9

    print(json.dumps({
        "metric": f"{n}^3 c2c 3D FFT throughput per chip",
        "value": round(gflops, 2),
        "unit": "GFLOP/s (5N log2 N model)",
        "vs_baseline": round(gflops / gflops_np, 2),
    }))


if __name__ == '__main__':
    main()
