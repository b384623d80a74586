"""Serial timing harness with correctness asserts.

Port of the reference performance harness (reference: tests/test_speed.py):
times this framework's transform engine against numpy/scipy on the same
problem, asserts allclose, prints a table, stores no thresholds.
"""
from time import time

import numpy as np
import scipy.fft as sfft

import jax

from mpi4py_fft_tpu import fftw
from mpi4py_fft_tpu.ops import core


def _time(fn, loops=5):
    fn()  # warmup / compile
    t0 = time()
    for _ in range(loops):
        out = fn()
    if hasattr(out, 'block_until_ready'):
        out.block_until_ready()
    return (time() - t0) / loops


def test_speed_c2c():
    N = (64, 64, 64)
    rng = np.random.default_rng(0)
    C = (rng.random(N) + 1j * rng.random(N)).astype('D')

    plan = fftw.fftn(fftw.aligned(N, dtype='D'), axes=(0, 1, 2))
    plan.input_array[...] = C

    t_us = _time(lambda: plan())
    t_np = _time(lambda: np.fft.fftn(C, axes=(0, 1, 2)))
    t_sp = _time(lambda: sfft.fftn(C, axes=(0, 1, 2)))

    assert np.allclose(plan(), np.fft.fftn(C), atol=1e-8)
    print(f"\n64^3 c2c  ours(+{core.get_fft_impl()}): {t_us*1e3:8.2f} ms"
          f"  numpy: {t_np*1e3:8.2f} ms  scipy: {t_sp*1e3:8.2f} ms")

    # pure-device timing (no host copies) of the jitted engine
    import jax.numpy as jnp
    xd = jnp.asarray(C)
    f = jax.jit(lambda v: core.c2c(v, (0, 1, 2), True))
    t_dev = _time(lambda: f(xd))
    print(f"64^3 c2c  device-only jit: {t_dev*1e3:8.2f} ms")


def test_speed_r2c():
    N = (64, 64, 64)
    rng = np.random.default_rng(1)
    A = rng.random(N)

    plan = fftw.rfftn(fftw.aligned(N, dtype='d'), axes=(0, 1, 2))
    plan.input_array[...] = A
    t_us = _time(lambda: plan())
    t_np = _time(lambda: np.fft.rfftn(A, axes=(0, 1, 2)))
    assert np.allclose(plan(), np.fft.rfftn(A), atol=1e-8)
    print(f"\n64^3 r2c  ours: {t_us*1e3:8.2f} ms  numpy: {t_np*1e3:8.2f} ms")
