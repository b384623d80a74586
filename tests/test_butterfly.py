"""Stockham butterfly kernel (ops/pallas_butterfly.py) — interpret-mode
correctness on CPU vs numpy, across axis positions, signs, and shapes,
plus engine integration via set_butterfly_mode.

Reference test model: mpi4py_fft tests/test_fftw.py (round-trips and
cross-checks against numpy/scipy).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpi4py_fft_tpu.ops import matfft
from mpi4py_fft_tpu.ops import pallas_butterfly as pb


CASES = [
    ((8192, 256), 1),       # last axis (lane kernel)
    ((256, 8, 128), 0),     # leading axis
    ((16, 256, 2, 128), 1),  # middle axis
    ((8, 256, 128), 1),     # middle axis, minimal chunking
    ((256, 1024), 0),       # leading axis, 2-D
    ((1024, 8, 16), 2),     # last axis, small N
    ((4096, 16), 1),        # last axis, N=16
]


@pytest.mark.parametrize('shape,axis', CASES)
@pytest.mark.parametrize('forward', [True, False])
def test_butterfly_axis(shape, axis, forward):
    assert pb.supported_axis(shape, axis, np.float32)
    rng = np.random.default_rng(42)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))
    y = pb.fft_axis_p(p, axis, forward, interpret=True)
    got = np.asarray(y[0]) + 1j * np.asarray(y[1])
    if forward:
        ref = np.fft.fft(z, axis=axis)
    else:
        ref = np.fft.ifft(z, axis=axis) * shape[axis]
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-6, rel


@pytest.mark.parametrize('N', [96, 384, 768])
@pytest.mark.parametrize('pos', ['lead', 'mid', 'last'])
def test_butterfly_radix3_lengths(N, pos):
    """3*2^a lengths (the 3/2-rule dealiasing extents, e.g. 768 = 1.5*512)
    ride the butterfly kernels via one radix-3 stage — regression-pin them
    across all axis positions (reference padding semantics:
    libfft.py:263-311)."""
    shape, axis = {
        'lead': ((N, 8, 128), 0),
        'mid': ((8, N, 128), 1),
        'last': ((1024, N), 1),
    }[pos]
    assert pb.supported_axis(shape, axis, np.float32)
    rng = np.random.default_rng(11)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))
    y = pb.fft_axis_p(p, axis, True, interpret=True)
    got = np.asarray(y[0]) + 1j * np.asarray(y[1])
    ref = np.fft.fft(z, axis=axis)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 5e-6
    b = pb.fft_axis_p(y, axis, False, interpret=True) / N
    rt = np.linalg.norm(np.asarray(b) - np.asarray(p)) \
        / np.linalg.norm(np.asarray(p))
    assert rt < 5e-6, rt


def test_stage_plan_override_rejects_leading_odd():
    """A STAGE_PLAN override whose first radix is odd (e.g. '3,16,16')
    must be rejected (the split-pair entry assumes an even first stage);
    the measured default is used instead."""
    import mpi4py_fft_tpu.ops.pallas_butterfly as pbm
    prev = pbm._STAGE_PLAN_ENV
    pbm._stage_plan.cache_clear()
    try:
        pbm._STAGE_PLAN_ENV = '3,16,16'
        assert pbm._stage_plan(768) == pbm._default_plan(768)
        assert pbm._stage_plan(768)[0] % 2 == 0
        pbm._stage_plan.cache_clear()
        pbm._STAGE_PLAN_ENV = '16,16,3'
        assert pbm._stage_plan(768) == (16, 16, 3)
    finally:
        pbm._STAGE_PLAN_ENV = prev
        pbm._stage_plan.cache_clear()


def test_supported_axis_gate():
    # non-pow2, too-large, f64, and bad chunking must be rejected
    assert not pb.supported_axis((12, 256), 1, np.float32)
    assert not pb.supported_axis((8192, 4096), 1, np.float32)
    assert not pb.supported_axis((8192, 256), 1, np.float64)
    assert not pb.supported_axis((100, 256, 100), 1, np.float32)
    assert not pb.supported_axis((8, 256), 1, np.float32)  # pre % 1024
    assert pb.supported_axis((8, 256, 128), 1, np.float32)


def test_engine_integration_3d():
    """fft1d_p uses the butterfly kernel when forced on; results must
    match the einsum engine to f32 roundoff, composed over 3 axes."""
    rng = np.random.default_rng(3)
    shape = (64, 128, 128)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))

    matfft.set_butterfly_mode('off')
    try:
        ref = p
        for ax in (2, 1, 0):
            ref = matfft.fft1d_p(ref, ax, True)
        ref = np.asarray(ref[0]) + 1j * np.asarray(ref[1])
    finally:
        matfft.set_butterfly_mode('auto')

    matfft.set_butterfly_mode('on')
    try:
        got = p
        for ax in (2, 1, 0):
            got = matfft.fft1d_p(got, ax, True)
        got = np.asarray(got[0]) + 1j * np.asarray(got[1])
    finally:
        matfft.set_butterfly_mode('auto')

    npref = np.fft.fftn(z)
    assert np.linalg.norm(got - ref) / np.linalg.norm(npref) < 5e-5
    assert np.linalg.norm(got - npref) / np.linalg.norm(npref) < 5e-5


def test_roundtrip():
    rng = np.random.default_rng(7)
    shape = (1024, 256)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))
    y = pb.fft_axis_p(p, 1, True, interpret=True)
    b = pb.fft_axis_p(y, 1, False, interpret=True) / shape[1]
    err = np.linalg.norm(np.asarray(b) - np.asarray(p)) \
        / np.linalg.norm(np.asarray(p))
    assert err < 5e-6, err


@pytest.mark.parametrize('shape,axis', [
    ((512, 8, 128), 0),      # DIT (no leading batch)
    ((8, 512, 128), 1),      # DIF middle
    ((1024, 512), 1),        # DIF last
    ((16, 1024, 128), 1),    # R=4 middle
    ((2048, 1024), 1),       # R=4 last
])
@pytest.mark.parametrize('forward', [True, False])
def test_four_step_large_axis(shape, axis, forward):
    """N > 256 axes run as an XLA-fused outer DFT-R stage around the
    Q=256 kernel (four-step algorithm); must match numpy."""
    rng = np.random.default_rng(21)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))
    matfft.set_butterfly_mode('on')
    try:
        split = matfft._butterfly_large_split(shape, axis, np.float32)
        assert split is not None
        y = matfft.fft1d_p(p, axis, forward)
    finally:
        matfft.set_butterfly_mode('auto')
    got = np.asarray(y[0]) + 1j * np.asarray(y[1])
    if forward:
        ref = np.fft.fft(z, axis=axis)
    else:
        ref = np.fft.ifft(z, axis=axis) * shape[axis]
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-6, rel


@pytest.mark.parametrize('shape,axis', [
    ((2048, 8, 128), 0),     # DIT lead, N=2048 (beyond the fused cap)
    ((8, 2048, 128), 1),     # DIF mid
    ((4096, 8, 128), 0),     # DIT lead, N=4096
    ((8, 4096, 128), 1),     # DIF mid
])
@pytest.mark.parametrize('forward', [True, False])
def test_four_step_beyond_fused_cap(shape, axis, forward):
    """N > _MAX_N_AXIS (1024): the four-step wraps the LONGEST fused
    kernel (Q=1024) with a tiny outer R<=4 stage instead of falling to
    the dense einsum engine and its full-volume HLO temps (VERDICT r3
    weak #7)."""
    rng = np.random.default_rng(23)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))
    matfft.set_butterfly_mode('on')
    try:
        split = matfft._butterfly_large_split(shape, axis, np.float32)
        assert split is not None and split[1] == 1024
        y = matfft.fft1d_p(p, axis, forward)
    finally:
        matfft.set_butterfly_mode('auto')
    got = np.asarray(y[0]) + 1j * np.asarray(y[1])
    if forward:
        ref = np.fft.fft(z, axis=axis)
    else:
        ref = np.fft.ifft(z, axis=axis) * shape[axis]
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-6, rel


def test_four_step_gates():
    # post too small for DIT, R > 4, non-pow2, f64
    matfft.set_butterfly_mode('on')
    try:
        ls = matfft._butterfly_large_split
        # (1024, 8, 16) IS now supported (ragged lane blocks); a post
        # below one lane tile is not
        assert ls((1024, 2, 4), 0, np.float32) is None
        # 2048 is a supported long-axis split now (Q=1024, R=2);
        # 8192 (R=8) is not
        assert ls((8, 2048, 128), 1, np.float32) == (2, 1024, False)
        assert ls((8, 8192, 128), 1, np.float32) is None
        assert ls((8, 768, 128), 1, np.float32) is None
        assert ls((8, 512, 128), 1, np.float64) is None
        assert ls((8, 512, 128), 1, np.float32) is not None
    finally:
        matfft.set_butterfly_mode('auto')


@pytest.mark.parametrize('shape,axis,hext', [
    ((8192, 256), 1, None),
    ((8192, 256), 1, 132),      # shardable-extent padding out of the kernel
    ((256, 8, 128), 0, None),
    ((8, 256, 128), 1, 130),
])
@pytest.mark.parametrize('packed', ['on', 'off'])
def test_r2c_c2r_kernels(shape, axis, hext, packed):
    """Real-side kernels: r2c writes only the (optionally padded)
    Hermitian half; c2r ignores pad rows and writes only the real part.
    Both the packed N/2-point kernels (default) and the full-c2c
    fallback must agree with numpy (FFTW r2c guru-path parity,
    reference: fftw/fftw_planxfftn.c:50-56)."""
    prev = pb._PACKED_MODE
    pb.set_packed_mode(packed)
    try:
        rng = np.random.default_rng(33)
        x = rng.standard_normal(shape).astype(np.float32)
        y = pb.rfft_axis_p(jnp.asarray(x), axis, hext=hext,
                           interpret=True)
        got = np.asarray(y[0]) + 1j * np.asarray(y[1])
        ref = np.fft.rfft(x, axis=axis)
        nh = ref.shape[axis]
        head = np.take(got, range(nh), axis=axis)
        assert np.linalg.norm(head - ref) / np.linalg.norm(ref) < 5e-6
        if got.shape[axis] > nh:
            tail = np.take(got, range(nh, got.shape[axis]), axis=axis)
            assert float(np.abs(tail).max()) == 0.0
        xr = pb.irfft_axis_p(y, axis, shape[axis],
                             scale=1.0 / shape[axis], interpret=True)
        assert np.linalg.norm(np.asarray(xr) - x) / np.linalg.norm(x) \
            < 5e-6
    finally:
        pb.set_packed_mode(prev)


PLANE_CASES = [
    (4, 256, 256),        # T=4 (the 256^3 per-axis shape)
    (16, 128, 128),       # T=8
    (8, 2, 64, 256),      # T=16, 4-D
]


@pytest.mark.parametrize('shape', PLANE_CASES)
@pytest.mark.parametrize('forward', [True, False])
def test_plane_kernel(shape, forward):
    """Fused last-two-axes kernel vs numpy fft2 (interpret mode)."""
    assert pb.supported_plane(shape, np.float32)
    rng = np.random.default_rng(7)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))
    y = pb.fft_plane_p(p, forward, interpret=True)
    got = np.asarray(y[0]) + 1j * np.asarray(y[1])
    if forward:
        ref = np.fft.fft2(z, axes=(-2, -1))
    else:
        ref = np.fft.ifft2(z, axes=(-2, -1)) * (shape[-1] * shape[-2])
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-6, rel


def test_plane_scale_and_gate():
    shape = (4, 256, 256)
    rng = np.random.default_rng(8)
    z = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    p = jnp.asarray(np.stack([z.real, z.imag]))
    n12 = shape[-1] * shape[-2]
    y = pb.fft_plane_p(p, True, interpret=True)
    back = pb.fft_plane_p(y, False, interpret=True, scale=1.0 / n12)
    rel = np.linalg.norm(np.asarray(back) - np.asarray(p)) \
        / np.linalg.norm(np.asarray(p))
    assert rel < 5e-6, rel
    # gates
    assert not pb.supported_plane((4, 256, 256), np.float64)
    assert not pb.supported_plane((3, 256, 256), np.float32)  # pre % T
    assert not pb.supported_plane((4, 256, 96), np.float32)   # lane mult
    assert not pb.supported_plane((4, 512, 256), np.float32)  # > _MAX_N
    assert not pb.supported_plane((256,), np.float32)


@pytest.mark.parametrize('shape,axis,Nt', [
    ((8, 256, 128), 1, 86),
    ((8192, 96), 1, 33),
    ((96, 8, 128), 0, 33),
])
@pytest.mark.parametrize('packed', ['on', 'off'])
def test_r2c_fused_hermitian_trunc(shape, axis, Nt, packed):
    """rfft_axis_p(trunc=Nt): the 3/2-rule HERMITIAN truncation fused
    into the kernel write == truncate_planar of the full half-spectrum
    (reference: libfft.py:263-284)."""
    from mpi4py_fft_tpu.libfft import truncate_planar
    prev = pb._PACKED_MODE
    pb.set_packed_mode(packed)
    try:
        rng = np.random.default_rng(41)
        x = rng.standard_normal(shape).astype(np.float32)
        got = np.asarray(pb.rfft_axis_p(jnp.asarray(x), axis, trunc=Nt,
                                        interpret=True))
        full = np.fft.rfft(x, axis=axis)
        fullp = jnp.asarray(np.stack([full.real, full.imag])
                            .astype(np.float32))
        ref = np.asarray(truncate_planar(fullp, 1 + axis, Nt, True))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    finally:
        pb.set_packed_mode(prev)


@pytest.mark.parametrize('shape,axis,Nt', [
    ((8, 256, 128), 1, 86),
    ((8192, 96), 1, 33),
    ((96, 8, 128), 0, 33),
])
def test_c2r_fused_hermitian_pad(shape, axis, Nt):
    """irfft_axis_p on a TRUNCATED hermitian spectrum: the 3/2-rule
    zero-padding fused into the kernel read == pad_planar + inverse
    (reference: libfft.py:286-311).  Packed-kernel path only."""
    from mpi4py_fft_tpu.libfft import pad_planar, truncate_planar
    N = shape[axis]
    rng = np.random.default_rng(43)
    x = rng.standard_normal(shape).astype(np.float32)
    h = np.fft.rfft(x, axis=axis)
    hp = jnp.asarray(np.stack([h.real, h.imag]).astype(np.float32))
    tp = truncate_planar(hp, 1 + axis, Nt, True)
    tshape = tuple(np.asarray(tp).shape[1:])
    assert pb.supported_c2r(tshape, axis, N, np.float32)
    got = np.asarray(pb.irfft_axis_p(jnp.asarray(np.asarray(tp)), axis,
                                     N, scale=1.0 / N, interpret=True))
    padded = pad_planar(tp, 1 + axis, N // 2 + 1, True)
    zi = np.asarray(padded[0]) + 1j * np.asarray(padded[1])
    ref = np.fft.irfft(zi, n=N, axis=axis)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_pair_axis_gates():
    """N = 2048 axes dispatch the fused pair-kernel path directly;
    4096 stays on the Q=1024 four-step (measured faster than wrapping
    the pair, docs/benchmarks.md)."""
    matfft.set_butterfly_mode('on')
    try:
        up = matfft._use_butterfly_pair
        assert up((2048, 8, 128), 0, np.float32)
        assert up((8, 2048, 128), 1, np.float32)
        assert not up((4096, 8, 128), 0, np.float32)   # > _MAX_N_PAIR
        assert not up((1024, 8, 128), 0, np.float32)   # single kernel
        assert not up((2048, 8, 128), 0, np.float64)   # f32 only
    finally:
        matfft.set_butterfly_mode('auto')
