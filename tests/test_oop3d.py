"""Quartered out-of-place 3-D schedule (ops/oop3d.py) and the
split-axis 2-in/2-out kernels (pallas_butterfly.fft_axis2_p).

Strategy mirrors tests/test_butterfly.py: interpret-mode kernels vs
numpy on CPU (reference test style: mpi4py-fft tests/test_fftw.py
round-trip + vs-reference sweeps).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mpi4py_fft_tpu.ops import oop3d
from mpi4py_fft_tpu.ops import pallas_butterfly as pb

SHAPE = (16, 128, 256)          # smallest quarterable supported shape


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_supported():
    assert oop3d.supported_q(SHAPE, np.float32)
    assert not oop3d.supported_q((15, 128, 256), np.float32)   # odd X
    assert not oop3d.supported_q(SHAPE, np.float64)            # f64
    assert not oop3d.supported_q((16, 128), np.float32)        # 2-D


def test_split_assemble_roundtrip():
    x = _rng().standard_normal((2,) + SHAPE).astype(np.float32)
    qs = oop3d.split_q(jnp.asarray(x))
    assert qs[0].shape == (2, SHAPE[0] // 2, SHAPE[1], SHAPE[2] // 2)
    y = np.asarray(oop3d.assemble_q(qs))
    assert np.array_equal(y, x)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_fft_axis2_vs_numpy(axis):
    """Split-axis pair kernel == numpy fft along the rebuilt axis.

    axis=1 exercises the mid-axis pair kernel (_kern_mid2), which the
    quartered schedule itself never uses (its y pass is the 1-in
    kernel) but which is reachable through the public fft_axis2_p."""
    full = [16, 128, 256]
    full[axis] = {0: 16, 1: 64, 2: 256}[axis]
    if axis == 1:
        full = [16, 64, 128]
    half = list(full)
    half[axis] //= 2
    if not pb.supported_axis_split(tuple(half), axis, np.float32):
        pytest.skip("shape not supported for split kernel")
    x = _rng(1).standard_normal((2,) + tuple(full)).astype(np.float32)
    h = full[axis] // 2
    sl_a = [slice(None)] * 4
    sl_b = [slice(None)] * 4
    sl_a[1 + axis] = slice(0, h)
    sl_b[1 + axis] = slice(h, None)
    pa = jnp.asarray(x[tuple(sl_a)])
    pb_ = jnp.asarray(x[tuple(sl_b)])
    oa, ob = pb.fft_axis2_p(pa, pb_, axis, True, interpret=True)
    got = np.concatenate([np.asarray(oa), np.asarray(ob)], axis=1 + axis)
    ref = np.fft.fft(x[0] + 1j * x[1], axis=axis)
    rel = (np.abs((got[0] + 1j * got[1]) - ref).max()
           / np.abs(ref).max())
    assert rel < 1e-5, rel


def test_fft_axis2_alias_matches_oop():
    """alias=True (in-place pair, FFTW_DESTROY_INPUT-style) must compute
    the same transform as the default out-of-place pair (the aliasing
    only changes buffer assignment; interpret mode ignores it, so this
    pins the trace path)."""
    full = (16, 64, 128)
    half = (8, 64, 128)
    assert pb.supported_axis_split(half, 0, np.float32)
    x = _rng(9).standard_normal((2,) + full).astype(np.float32)
    pa, pb_ = jnp.asarray(x[:, :8]), jnp.asarray(x[:, 8:])
    oa, ob = pb.fft_axis2_p(pa, pb_, 0, True, interpret=True)
    aa, ab = pb.fft_axis2_p(pa, pb_, 0, True, interpret=True, alias=True)
    assert np.array_equal(np.asarray(oa), np.asarray(aa))
    assert np.array_equal(np.asarray(ob), np.asarray(ab))
    got = np.concatenate([np.asarray(aa), np.asarray(ab)], axis=1)
    ref = np.fft.fft(x[0] + 1j * x[1], axis=0)
    rel = np.abs((got[0] + 1j * got[1]) - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, rel


def test_fft3_q_vs_numpy_and_roundtrip():
    x = _rng(2).standard_normal((2,) + SHAPE).astype(np.float32)
    qs = oop3d.split_q(jnp.asarray(x))
    ys = oop3d.fft3_q(qs, True, interpret=True)
    y = np.asarray(oop3d.assemble_q(ys))
    ref = np.fft.fftn(x[0] + 1j * x[1], axes=(0, 1, 2))
    rel = (np.abs((y[0] + 1j * y[1]) - ref).max() / np.abs(ref).max())
    assert rel < 1e-5, rel
    # inverse with folded normalization
    zs = oop3d.fft3_q(ys, False, scale=1.0 / np.prod(SHAPE),
                      interpret=True)
    z = np.asarray(oop3d.assemble_q(zs))
    assert np.abs(z - x).max() < 1e-4


def test_planar_pfft_quartered_matches_full():
    """PlanarPFFT's quartered path == its full-volume path."""
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT
    from mpi4py_fft_tpu.parallel import DeviceComm
    import jax
    # the schedule is single-device: pin a 1-device comm regardless of
    # the test mesh size
    pfft = PlanarPFFT(DeviceComm(jax.devices()[:1]), SHAPE, dtype='F')
    assert pfft.quartered
    x = _rng(3).standard_normal((2,) + SHAPE).astype(np.float32)
    p = jnp.asarray(x)
    full = np.asarray(pfft.forward_fn(p))
    qs = oop3d.split_q(p)
    quart = np.asarray(oop3d.assemble_q(pfft.forward_fn_q(qs)))
    assert np.abs(full - quart).max() <= 1e-5 * np.abs(full).max()
    back = np.asarray(oop3d.assemble_q(
        pfft.backward_fn_q(oop3d.split_q(jnp.asarray(quart)))))
    assert np.abs(back - x).max() < 1e-4


def test_fft3_8_vs_numpy_and_roundtrip():
    """Eighths schedule (split_8/fft3_8): every pass an OOP pair with
    minimum in-flight memory; must match numpy and round-trip."""
    shape = (32, 128, 256)
    assert oop3d.supported_8(shape, np.float32)
    assert not oop3d.supported_8((31, 128, 256), np.float32)  # odd X
    assert not oop3d.supported_8(shape, np.float64)
    x = _rng(5).standard_normal((2,) + shape).astype(np.float32)
    es = oop3d.split_8(jnp.asarray(x))
    assert es[0].shape == (2, 16, 64, 128)
    assert np.array_equal(np.asarray(oop3d.assemble_8(es)), x)
    ys = oop3d.fft3_8(es, True, interpret=True)
    y = np.asarray(oop3d.assemble_8(ys))
    ref = np.fft.fftn(x[0] + 1j * x[1], axes=(0, 1, 2))
    rel = np.abs((y[0] + 1j * y[1]) - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, rel
    zs = oop3d.fft3_8(ys, False, scale=1.0 / np.prod(shape),
                      interpret=True)
    z = np.asarray(oop3d.assemble_8(zs))
    assert np.abs(z - x).max() < 1e-4
