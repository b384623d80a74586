"""Pallas fused FFT kernel tests (interpret mode on the CPU harness)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mpi4py_fft_tpu.ops import matfft, pallas_fft


@pytest.mark.parametrize("N", [64, 256, 512, 1024])
def test_fused_kernel_matches_numpy(N):
    if not pallas_fft.supported_length(N):
        pytest.skip(f"N={N} not a fused two-stage length")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, N)) + 1j * rng.standard_normal((6, N))
    p = matfft.planar(jnp.asarray(x))
    y = pallas_fft.fft2stage_p(p, -1, interpret=True)
    got = np.asarray(y[0]) + 1j * np.asarray(y[1])
    ref = np.fft.fft(x, axis=1)
    assert np.allclose(got, ref, atol=1e-9 * N)
    yi = pallas_fft.fft2stage_p(p, +1, interpret=True)
    goti = np.asarray(yi[0]) + 1j * np.asarray(yi[1])
    refi = np.fft.ifft(x, axis=1) * N
    assert np.allclose(goti, refi, atol=1e-9 * N)


def test_dispatch_mode():
    """'on' routes through the kernel (interpret on CPU), 'off' never does."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 256)) + 1j * rng.standard_normal((4, 256))
    p = matfft.planar(jnp.asarray(x))
    ref = np.fft.fft(x, axis=1)
    try:
        matfft.set_pallas_mode('on')
        y = matfft.fft1d_p(p, 1, True)
        got = np.asarray(y[0]) + 1j * np.asarray(y[1])
        assert np.allclose(got, ref, atol=1e-7)
    finally:
        matfft.set_pallas_mode('auto')
