"""Double-single (two-float32) butterfly tier — ops/pallas_ds.py.

The on-chip f64 PRODUCTION tier: error-free f32 transformations must
land ~5 orders of magnitude inside the reference's double tolerance
2e-10 (reference: tests/test_mpifft.py:17).  Covers the kernel
primitives, packed r2c/c2r, the multi-axis driver, the PlanarPFFT
dispatch (single-device c2c+r2c and multi-device shard_map c2c), and
the serial-engine gates — all in interpret mode (CPU); the on-chip
verification lives in scripts/tpu_ds_probe.py and
scripts/tpu_ds_pipeline_probe.py, measured numbers in
docs/precision.md.
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
    assert ds.supported_ds((8, 256, 128), 1)       # any axis now
    assert ds.supported_rfft_ds((64, 64, 64), 2)
    assert not ds.supported_rfft_ds((2, 8, 128), 0)  # half too short


def _forced_ds():
    import contextlib

    @contextlib.contextmanager
    def ctx():
        prev = ds.ds_mode()
        ds.set_ds_mode('on')
        try:
            yield
        finally:
            ds.set_ds_mode(prev)
    return ctx()


def test_ds_rfft_irfft():
    """Packed-real DS pair vs numpy, lead and mid axis, with scaling."""
    import jax.numpy as jnp
    from mpi4py_fft_tpu.ops.pallas_ds import (
        split_real_ds, join_planar_ds, join_real_ds)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((64, 8, 128))
    X = ds.rfft_axis_ds(split_real_ds(jnp.asarray(x)), 0, interpret=True)
    g = np.asarray(join_planar_ds(X))
    rel = np.linalg.norm((g[0] + 1j * g[1]) - np.fft.rfft(x, axis=0)) \
        / np.linalg.norm(np.fft.rfft(x, axis=0))
    assert rel < D_TOL / 1e3, rel
    y = ds.irfft_axis_ds(X, 0, 64, scale=1.0 / 64, interpret=True)
    back = np.asarray(join_real_ds(y))
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < D_TOL / 1e3
    # mid axis
    x2 = rng.standard_normal((8, 32, 128))
    X2 = ds.rfft_axis_ds(split_real_ds(jnp.asarray(x2)), 1, interpret=True)
    g2 = np.asarray(join_planar_ds(X2))
    r2 = np.fft.rfft(x2, axis=1)
    assert np.linalg.norm((g2[0] + 1j * g2[1]) - r2) \
        / np.linalg.norm(r2) < D_TOL / 1e3


def test_ds_fftn():
    import jax.numpy as jnp
    from mpi4py_fft_tpu.ops.pallas_ds import (
        split_planar_ds, join_planar_ds)
    rng = np.random.default_rng(6)
    z = rng.standard_normal((32, 32, 32)) \
        + 1j * rng.standard_normal((32, 32, 32))
    q = split_planar_ds(jnp.asarray(np.stack([z.real, z.imag])))
    Y = ds.fftn_ds(q, (2, 1, 0), True, scale=1.0 / z.size, interpret=True)
    g = np.asarray(join_planar_ds(Y))
    ref = np.fft.fftn(z) / z.size
    assert np.linalg.norm((g[0] + 1j * g[1]) - ref) \
        / np.linalg.norm(ref) < D_TOL / 1e3


def test_ds_planar_pipeline_single_device():
    """PlanarPFFT routes dtype='D'/'d' through the DS tier (forced mode;
    interpret kernels on CPU): c2c and r2c round trips vs numpy at the
    reference d-tolerance (reference: tests/test_mpifft.py:17)."""
    import jax.numpy as jnp
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT
    rng = np.random.default_rng(7)
    with _forced_ds():
        p = PlanarPFFT(None, (32, 32, 32), dtype='D', grid=(1, 1, 1))
        assert p._ds
        z = rng.standard_normal((32,) * 3) \
            + 1j * rng.standard_normal((32,) * 3)
        x = jnp.asarray(np.stack([z.real, z.imag]))
        uh = p.forward(x)
        ref = np.fft.fftn(z) / z.size
        g = np.asarray(uh)
        assert np.linalg.norm((g[0] + 1j * g[1]) - ref) \
            / np.linalg.norm(ref) < D_TOL
        gb = np.asarray(p.backward(uh))
        assert np.linalg.norm((gb[0] + 1j * gb[1]) - z) \
            / np.linalg.norm(z) < D_TOL

        pr = PlanarPFFT(None, (64, 64, 64), dtype='d', grid=(1, 1, 1))
        assert pr._ds and pr._ds_hext == 48
        xr = rng.standard_normal((64,) * 3)
        uh = pr.forward(jnp.asarray(xr))
        refr = np.fft.rfftn(xr) / xr.size
        g = np.asarray(uh)
        assert np.linalg.norm((g[0] + 1j * g[1]) - refr) \
            / np.linalg.norm(refr) < D_TOL
        yb = np.asarray(pr.backward(uh))
        assert np.linalg.norm(yb - xr) / np.linalg.norm(xr) < D_TOL


def test_ds_planar_pipeline_shard_map():
    """The (2, 2)+S planar-DS layout rides the tiled all_to_all pencil
    transposes of the shard_map executor unchanged (multi-device c2c)."""
    import jax
    import jax.numpy as jnp
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(8)
    with _forced_ds():
        pm = PlanarPFFT(None, (64, 64, 64), dtype='D', grid=(2, 2))
        assert pm._ds and pm.executor == 'shard_map'
        z = rng.standard_normal((64,) * 3) \
            + 1j * rng.standard_normal((64,) * 3)
        x = jnp.asarray(np.stack([z.real, z.imag]))
        uh = pm.forward(x)
        ref = np.fft.fftn(z) / z.size
        g = np.asarray(uh)
        assert np.linalg.norm((g[0] + 1j * g[1]) - ref) \
            / np.linalg.norm(ref) < D_TOL
        gb = np.asarray(pm.backward(uh))
        assert np.linalg.norm((gb[0] + 1j * gb[1]) - z) \
            / np.linalg.norm(z) < D_TOL


def test_ds_serial_engine_gate():
    """matfft.fft1d_p / rfftn_p / irfftn_p dispatch f64 through the DS
    tier under forced mode (the serial-engine analogue of the
    reference's f64-default FFTW path, libfft.py:225,314)."""
    import jax.numpy as jnp
    from mpi4py_fft_tpu.ops import matfft
    rng = np.random.default_rng(9)
    z = rng.standard_normal((16, 64, 128)) \
        + 1j * rng.standard_normal((16, 64, 128))
    p = jnp.asarray(np.stack([z.real, z.imag]))
    with _forced_ds():
        y = np.asarray(matfft.fft1d_p(p, 1, True, scale=0.5))
    ref = np.fft.fft(z, axis=1) * 0.5
    assert np.linalg.norm((y[0] + 1j * y[1]) - ref) \
        / np.linalg.norm(ref) < D_TOL / 1e3
    x = rng.standard_normal((16, 64, 128))
    with _forced_ds():
        Y = np.asarray(matfft.rfftn_p(jnp.asarray(x), (2,)))
        back = np.asarray(matfft.irfftn_p(
            jnp.asarray(Y), (2,), 128, scale=1.0 / 128))
    refr = np.fft.rfft(x, axis=2)
    assert np.linalg.norm((Y[0] + 1j * Y[1]) - refr) \
        / np.linalg.norm(refr) < D_TOL / 1e3
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < D_TOL / 1e3


def test_ds_unit_extent_dims():
    """Dispatch canonicalizes on (pre, N, post): unit-extent dims around
    the transform axis must not mis-route to the wrong kernel (found by
    round-5 review: (1, 256, 1024) axis 1 crashed in _tw_pack_ds(1))."""
    import jax.numpy as jnp
    from mpi4py_fft_tpu.ops.pallas_ds import (
        split_planar_ds, join_planar_ds)
    rng = np.random.default_rng(10)
    for shape, ax in (((1, 64, 1024), 1), ((64, 16, 64, 1), 2),
                      ((1, 1, 64, 1024), 2)):
        assert ds.supported_ds(shape, ax)
        z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        q = split_planar_ds(jnp.asarray(np.stack([z.real, z.imag])))
        y = ds.fft_axis_ds(q, ax, True, interpret=True)
        g = np.asarray(join_planar_ds(y))
        ref = np.fft.fft(z, axis=ax)
        rel = np.linalg.norm((g[0] + 1j * g[1]) - ref) \
            / np.linalg.norm(ref)
        assert rel < D_TOL / 1e3, (shape, ax, rel)
