"""Double-single (two-float32) butterfly tier — ops/pallas_ds.py.

The on-chip f64-precision prototype: error-free f32 transformations
must land ~5 orders of magnitude inside the reference's double
tolerance 2e-10 (reference: tests/test_mpifft.py:17).  Interpret-mode
(CPU) checks; the on-chip verification lives in scripts/tpu_ds_probe.py
and its measured numbers in docs/precision.md.
"""
import numpy as np
import pytest

from mpi4py_fft_tpu.ops import pallas_ds as ds

D_TOL = 2e-10        # reference parallel f64 tolerance


def test_ds_primitives():
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal(1000)
    b64 = rng.standard_normal(1000)

    def split(x):
        hi = x.astype(np.float32)
        return hi, (x - hi.astype(np.float64)).astype(np.float32)

    xa, xb = split(a64), split(b64)
    s = ds.ds_add(xa, xb)
    p = ds.ds_mul(xa, xb)
    add_err = np.abs(s[0].astype(np.float64) + s[1] - (a64 + b64))
    mul_err = np.abs(p[0].astype(np.float64) + p[1] - (a64 * b64))
    # DS carries ~2^-48 relative error; for |values| up to ~4 that is
    # ~1.4e-14 absolute (input split representation alone is 3.6e-15)
    assert add_err.max() < 5e-14
    assert mul_err.max() < 1e-13


def test_to_from_ds_roundtrip():
    rng = np.random.default_rng(1)
    z = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    back = ds.from_ds(ds.to_ds(z))
    assert np.abs(back - z).max() < 1e-14     # representation error only


@pytest.mark.parametrize('N', [64, 128, 256, 512])
def test_ds_fft_accuracy(N):
    rng = np.random.default_rng(2)
    shape = (N, 8, 128)
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    assert ds.supported_ds(shape, 0)
    y = ds.fft_axis_ds(np.asarray(ds.to_ds(z)), 0, True, interpret=True)
    got = ds.from_ds(np.asarray(y))
    ref = np.fft.fft(z, axis=0)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < D_TOL / 1e3, rel             # expect ~1e-15


def test_ds_fft_roundtrip_and_axis_move():
    rng = np.random.default_rng(3)
    shape = (16, 64, 128)                     # transform the MID axis
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    p = np.asarray(ds.to_ds(z))
    y = ds.fft_axis_ds(p, 1, True, interpret=True)
    got = ds.from_ds(np.asarray(y))
    ref = np.fft.fft(z, axis=1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < D_TOL / 1e3
    b = ds.fft_axis_ds(np.asarray(y), 1, False, interpret=True)
    back = ds.from_ds(np.asarray(b)) / shape[1]
    assert np.linalg.norm(back - z) / np.linalg.norm(z) < D_TOL / 1e3


def test_supported_ds_gate():
    assert ds.supported_ds((256, 8, 128), 0)
    assert not ds.supported_ds((255, 8, 128), 0)   # non-pow2
    assert not ds.supported_ds((2048, 8, 128), 0)  # > cap
    assert not ds.supported_ds((256, 8, 100), 0)   # post % 1024
