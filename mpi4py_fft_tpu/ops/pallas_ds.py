"""Compensated double-single (two-float32) butterfly kernels — the
on-chip f64 tier prototype.

TPUs have no native f64 vector path; the x64 einsum engine is orders of
magnitude off the f32 kernel rate (docs/precision.md,
docs/benchmarks.md).  This module runs the Stockham butterfly network in
**double-single arithmetic**: every logical f64 value travels as an
(hi, lo) pair of float32 with |lo| <= ulp(hi)/2, and every add/mul uses
error-free transformations (Knuth two-sum, Dekker split two-product) so
the pair carries ~2^-48 relative error — comfortably inside the
reference's double-precision tolerance 2e-10
(reference: tests/test_mpifft.py:17) while staying on the fast f32 VPU.

Layout: a logical complex128 array of shape ``shape`` travels as a
planar-DS real array ``(2, 2) + shape`` float32 — axis 0 = (re, im),
axis 1 = (hi, lo).  Use :func:`to_ds` / :func:`from_ds` at the host
boundary.

Status: production tier for power-of-two extents ≤ ``_MAX_N_DS``:
any-axis c2c (:func:`fft_axis_ds`, non-lead axes via one relayout),
multi-axis driver (:func:`fftn_ds`), packed-real r2c/c2r
(:func:`rfft_axis_ds` / :func:`irfft_axis_ds`, the N/2-point
pack–transform–untangle method with DS-precision twiddles), jittable
device-side boundary splits (:func:`split_planar_ds` /
:func:`join_planar_ds`), and exact/compensated scaling.  Dispatched
from the planar pipeline (parallel/planar.py, ``dtype='d'/'D'`` on TPU)
and from the serial engine (ops/matfft.fft1d_p).  Measured
accuracy/throughput: scripts/tpu_ds_probe.py → docs/precision.md.
Role: the performance-bearing analogue of the reference's
double-precision FFTW build (reference: setup.py:83-141).
"""
import functools
import os as _os

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_butterfly import _bspec, _is_pow2

__all__ = ['to_ds', 'from_ds', 'supported_ds', 'fft_axis_ds', 'fftn_ds',
           'rfft_axis_ds', 'irfft_axis_ds', 'split_planar_ds',
           'join_planar_ds', 'split_real_ds', 'join_real_ds',
           'supported_rfft_ds', 'ds_mode', 'set_ds_mode']

_LANE = 128
_SUB = 8
_MAX_N_DS = 1024

# ---------------------------------------------------------------------------
# double-single primitives (error-free transformations)
# ---------------------------------------------------------------------------
# IMPORTANT: these rely on IEEE f32 semantics of +,-,* without value-
# changing fusion.  XLA/Mosaic preserve IEEE for these ops; the on-chip
# probe (scripts/tpu_ds_probe.py) re-verifies the achieved precision on
# the installed toolchain.

_SPLITTER = 4097.0          # 2^12 + 1 (Veltkamp split for f32)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    """Assumes |a| >= |b| (holds for normalized results)."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def ds_add(x, y):
    s, e = _two_sum(x[0], y[0])
    return _quick_two_sum(s, e + (x[1] + y[1]))


def ds_neg(x):
    return (-x[0], -x[1])


def ds_sub(x, y):
    return ds_add(x, ds_neg(y))


def ds_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    return _quick_two_sum(p, e + (x[0] * y[1] + x[1] * y[0]))


def _cadd(z, w):
    return (ds_add(z[0], w[0]), ds_add(z[1], w[1]))


def _csub(z, w):
    return (ds_sub(z[0], w[0]), ds_sub(z[1], w[1]))


def _cmul(z, w):
    """(zr + i zi)(wr + i wi) in DS."""
    zr, zi = z
    wr, wi = w
    return (ds_sub(ds_mul(zr, wr), ds_mul(zi, wi)),
            ds_add(ds_mul(zr, wi), ds_mul(zi, wr)))


# ---------------------------------------------------------------------------
# host boundary
# ---------------------------------------------------------------------------

def to_ds(z):
    """complex128 (or float64) array -> planar-DS float32 (2, 2)+shape."""
    z = np.asarray(z)
    re, im = np.real(z), np.imag(z)
    out = np.empty((2, 2) + z.shape, np.float32)
    for c, comp in enumerate((re, im)):
        hi = comp.astype(np.float32)
        out[c, 0] = hi
        out[c, 1] = (comp - hi.astype(np.float64)).astype(np.float32)
    return out


def from_ds(p):
    """planar-DS float32 -> complex128."""
    p = np.asarray(p, np.float64)
    return (p[0, 0] + p[0, 1]) + 1j * (p[1, 0] + p[1, 1])


# ---------------------------------------------------------------------------
# twiddle pack (split from f64 on the host)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _plan_ds(N):
    """Radix plan: 4s then a trailing 2 (small radices keep the DS
    op count per stage minimal; in-register high radices do not pay in
    DS where two_prod dominates)."""
    plan = []
    L = N
    while L % 4 == 0 and L > 4:
        plan.append(4)
        L //= 4
    while L > 1:
        plan.append(2)
        L //= 2
    return tuple(plan)


@functools.lru_cache(maxsize=None)
def _tw_pack_ds(N, sign):
    """(2, 2, T) float32 — (re,im) x (hi,lo) twiddle rows, split from
    f64 (same row layout as pallas_butterfly._tw_pack)."""
    rows = []
    L = N
    for r in _plan_ds(N):
        Lq = L // r
        for j in range(1, r):
            ang = sign * 2.0 * np.pi * j * np.arange(Lq) / L
            rows.append(np.stack([np.cos(ang), np.sin(ang)]))
        L //= r
    c = np.concatenate(rows, axis=1)            # (2, T) f64
    hi = c.astype(np.float32)
    lo = (c - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo], axis=1)           # (2, 2, T)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _tw_at(tw_ref, off, Lq):
    """Twiddle slab ((re,im) DS pair) at pack offset ``off``."""
    wr = (tw_ref[0, 0, off:off + Lq][:, None],
          tw_ref[0, 1, off:off + Lq][:, None])
    wi = (tw_ref[1, 0, off:off + Lq][:, None],
          tw_ref[1, 1, off:off + Lq][:, None])
    return wr, wi


def _stage_ds(qs, r, L, off, tw_ref, sign):
    """One DS Stockham stage from r slabs (each a complex-DS tuple of
    (Lq, M, ...) arrays) to the concatenated state."""
    Lq = L // r

    def cat(zs):
        return tuple(
            tuple(jnp.concatenate([z[c][p] for z in zs], axis=1)
                  for p in (0, 1)) for c in (0, 1))

    if r == 2:
        a, b = qs
        s = _cadd(a, b)
        d = _csub(a, b)
        if L == 2:
            return cat([s, d])
        wr, wi = _tw_at(tw_ref, off, Lq)
        return cat([s, _cmul(d, (wr, wi))])
    # r == 4: radix-4 with trivial +/-i rotations
    q0, q1, q2, q3 = qs
    t0 = _cadd(q0, q2)
    t1 = _cadd(q1, q3)
    t2 = _csub(q0, q2)
    t3 = _csub(q1, q3)
    # w4 = exp(sign*i*pi/2): w4*z = (-sign*zi, sign*zr)
    if sign < 0:
        u3 = (t3[1], ds_neg(t3[0]))
    else:
        u3 = (ds_neg(t3[1]), t3[0])
    y0 = _cadd(t0, t1)
    y2 = _csub(t0, t1)
    y1 = _cadd(t2, u3)
    y3 = _csub(t2, u3)
    if L == 4:
        return cat([y0, y1, y2, y3])
    ys = [y0]
    for k, y in enumerate((y1, y2, y3)):
        wr, wi = _tw_at(tw_ref, off + k * Lq, Lq)
        ys.append(_cmul(y, (wr, wi)))
    return cat(ys)


def _butterfly_ds(z, tw_ref, N, sign):
    """Full DS Stockham network; ``z`` is a complex-DS tuple of
    (N, 8, 128) arrays."""
    z = tuple(tuple(v[:, None] for v in comp) for comp in z)
    L, off = N, 0
    for r in _plan_ds(N):
        Lq = L // r
        qs = [tuple(tuple(v[j * Lq:(j + 1) * Lq] for v in comp)
                    for comp in z) for j in range(r)]
        z = _stage_ds(qs, r, L, off, tw_ref, sign)
        off += (r - 1) * Lq
        L = Lq
    return tuple(tuple(v.reshape(N, _SUB, _LANE) for v in comp)
                 for comp in z)


def _kern_lead_ds(x_ref, tw_ref, o_ref, *, N, sign):
    """Lead-axis DS kernel: block (2, 2, N, 8, 128)."""
    z = ((x_ref[0, 0], x_ref[0, 1]), (x_ref[1, 0], x_ref[1, 1]))
    (rh, rl), (ih, il) = _butterfly_ds(z, tw_ref, N, sign)
    o_ref[0, 0], o_ref[0, 1] = rh, rl
    o_ref[1, 0], o_ref[1, 1] = ih, il


def _kern_mid_ds(x_ref, tw_ref, o_ref, *, N, sign):
    """Mid-axis DS kernel: block (2, 2, 8, N, 128) — the transform axis
    moves to the block lead with a tile-local transpose, so the
    HBM-side layout is untouched (no moveaxis relayout passes)."""
    def g(c, d):
        return jnp.transpose(x_ref[c, d], (1, 0, 2))
    z = ((g(0, 0), g(0, 1)), (g(1, 0), g(1, 1)))
    (rh, rl), (ih, il) = _butterfly_ds(z, tw_ref, N, sign)
    for (c, d), v in (((0, 0), rh), ((0, 1), rl),
                      ((1, 0), ih), ((1, 1), il)):
        o_ref[c, d] = jnp.transpose(v, (1, 0, 2))


def _kern_last_ds(x_ref, tw_ref, o_ref, *, N, sign):
    """Last-axis DS kernel: block (2, 2, 8, 128, N) — lanes swap with
    the transform axis inside the block (cf. the f32 last-axis
    variant), keeping the HBM layout untouched."""
    def g(c, d):
        x = jnp.swapaxes(x_ref[c, d], 1, 2)       # (8, N, 128)
        return jnp.transpose(x, (1, 0, 2))        # (N, 8, 128)
    z = ((g(0, 0), g(0, 1)), (g(1, 0), g(1, 1)))
    (rh, rl), (ih, il) = _butterfly_ds(z, tw_ref, N, sign)
    for (c, d), v in (((0, 0), rh), ((0, 1), rl),
                      ((1, 0), ih), ((1, 1), il)):
        o_ref[c, d] = jnp.swapaxes(jnp.transpose(v, (1, 0, 2)), 1, 2)


def supported_ds(shape, axis):
    """Gate for :func:`fft_axis_ds`: any axis of a power-of-two extent
    ≤ ``_MAX_N_DS`` whose complementary volume tiles the (8, 128) VPU
    block (non-lead axes pay one XLA relayout each way)."""
    nd = len(shape)
    axis = axis % nd
    N = shape[axis]
    if not _is_pow2(N) or N > _MAX_N_DS:
        return False
    post = int(np.prod(shape, dtype=np.int64)) // N
    return post % (_SUB * _LANE) == 0


def _tw_and_call(kern, x, block, imap, grid, N, sign, interpret):
    tw_small = jnp.asarray(_tw_pack_ds(N, sign))
    tw = jnp.broadcast_to(tw_small[:, :, :, None, None],
                          (2, 2, tw_small.shape[2], _SUB, _LANE))
    tw_spec = _bspec((2, 2, tw_small.shape[2], _SUB, _LANE),
                     lambda *g: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    kw = {}
    if not interpret:
        kw['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2 ** 20)
    return pl.pallas_call(
        functools.partial(kern, N=N, sign=sign),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[_bspec(block, imap, memory_space=pltpu.VMEM), tw_spec],
        out_specs=_bspec(block, imap, memory_space=pltpu.VMEM),
        interpret=interpret,
        **kw,
    )(x, tw)


@functools.partial(jax.jit, static_argnames=('sign', 'interpret'))
def _dispatch_ds(p, sign, interpret):
    """Lead-axis DS kernel call: p is (2, 2, N, rest...)."""
    shape = p.shape[2:]
    N = shape[0]
    post = int(np.prod(shape[1:], dtype=np.int64))
    x = p.reshape(2, 2, N, post // _LANE, _LANE)
    out = _tw_and_call(
        _kern_lead_ds, x, (2, 2, N, _SUB, _LANE),
        lambda i: (0, 0, 0, i, 0), (post // (_SUB * _LANE),),
        N, sign, interpret)
    return out.reshape(p.shape)


@functools.partial(jax.jit, static_argnames=('axis', 'sign', 'interpret'))
def _dispatch_ds_mid(p, axis, sign, interpret):
    """Mid-axis DS kernel call (no relayout): (2, 2, pre, N, post)."""
    shape = p.shape[2:]
    nd = len(shape)
    N = shape[axis]
    pre = int(np.prod(shape[:axis], dtype=np.int64))
    post = int(np.prod(shape[axis + 1:], dtype=np.int64))
    x = p.reshape(2, 2, pre, N, post)
    out = _tw_and_call(
        _kern_mid_ds, x, (2, 2, _SUB, N, _LANE),
        lambda i, j: (0, 0, i, 0, j), (pre // _SUB, post // _LANE),
        N, sign, interpret)
    return out.reshape(p.shape)


@functools.partial(jax.jit, static_argnames=('sign', 'interpret'))
def _dispatch_ds_last(p, sign, interpret):
    """Last-axis DS kernel call (no relayout): (2, 2, pre..., N)."""
    shape = p.shape[2:]
    N = shape[-1]
    pre = int(np.prod(shape[:-1], dtype=np.int64))
    x = p.reshape(2, 2, pre // _LANE, _LANE, N)
    out = _tw_and_call(
        _kern_last_ds, x, (2, 2, _SUB, _LANE, N),
        lambda i: (0, 0, i, 0, 0), (pre // (_SUB * _LANE),),
        N, sign, interpret)
    return out.reshape(p.shape)


def fft_axis_ds(p, axis=0, forward=True, interpret=None):
    """Unnormalized c2c FFT along ``axis`` of planar-DS data
    ``(2, 2) + shape`` at double-single precision.  Lead, mid and last
    axes each have a native-layout kernel variant (the transform axis
    reaches the block lead via tile-local moves, never an HBM
    relayout); other geometries fall back to one moveaxis relayout
    each way.  Dispatch is canonicalized on the (pre, N, post) view, so
    unit-extent dims around the transform axis are harmless."""
    nd = p.ndim - 2
    axis = axis % nd
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    sign = -1 if forward else +1
    shape = p.shape[2:]
    N = shape[axis]
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    if pre == 1:
        out = _dispatch_ds(p.reshape(2, 2, N, post), sign, interpret)
    elif post == 1:
        out = _dispatch_ds_last(p.reshape(2, 2, pre, N), sign, interpret)
    elif pre % _SUB == 0 and post % _LANE == 0:
        out = _dispatch_ds_mid(p.reshape(2, 2, pre, N, post), 1, sign,
                               interpret)
    else:
        # fallback: relayout to the lead position
        x = jnp.moveaxis(p.reshape(2, 2, pre, N, post), 3, 2)
        out = jnp.moveaxis(_dispatch_ds(x, sign, interpret), 2, 3)
    return out.reshape(p.shape)


# ---------------------------------------------------------------------------
# dispatch mode
# ---------------------------------------------------------------------------
# 'auto' (default): the planar pipeline and the serial engine route f64
# work through the DS kernels on TPU whenever the shapes are supported;
# 'on' forces DS even off-TPU (interpret mode — for tests); 'off'
# disables it (x64 einsum fallback).
_DS_MODE = _os.environ.get('MPI4PY_FFT_TPU_DS', 'auto')


def set_ds_mode(mode):
    global _DS_MODE
    assert mode in ('auto', 'on', 'off')
    _DS_MODE = mode


def ds_mode():
    return _DS_MODE


def ds_wanted():
    """Whether the DS tier should be dispatched for f64 on this backend
    (shape gates apply separately)."""
    if _DS_MODE == 'off':
        return False
    if _DS_MODE == 'on':
        return True
    return jax.default_backend() == 'tpu'


# ---------------------------------------------------------------------------
# jittable boundary conversions (device-side split/join; the numpy
# ``to_ds``/``from_ds`` above remain for host tests)
# ---------------------------------------------------------------------------

def _split64(x):
    """f64 array -> (hi, lo) f32 pair (exact: hi+lo == x)."""
    hi = x.astype(jnp.float32)
    return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)


def split_planar_ds(p):
    """Planar f64 ``(2,)+S`` -> planar-DS f32 ``(2, 2)+S``."""
    hi, lo = _split64(p)
    return jnp.stack([hi, lo], axis=1)


def join_planar_ds(q):
    """Planar-DS f32 ``(2, 2)+S`` -> planar f64 ``(2,)+S`` (exact)."""
    return q[:, 0].astype(jnp.float64) + q[:, 1].astype(jnp.float64)


def split_real_ds(x):
    """Real f64 ``S`` -> real-DS f32 ``(2,)+S``."""
    hi, lo = _split64(x)
    return jnp.stack([hi, lo])


def join_real_ds(q):
    """Real-DS f32 ``(2,)+S`` -> real f64 ``S`` (exact)."""
    return q[0].astype(jnp.float64) + q[1].astype(jnp.float64)


# -- array-level complex-DS views -------------------------------------------

def _unpack_cds(q):
    """(2, 2, ...) array -> complex-DS tuple ((rh, rl), (ih, il))."""
    return ((q[0, 0], q[0, 1]), (q[1, 0], q[1, 1]))


def _pack_cds(z):
    (rh, rl), (ih, il) = z
    return jnp.stack([jnp.stack([rh, rl]), jnp.stack([ih, il])])


def _cconj(z):
    return (z[0], ds_neg(z[1]))


def _scale_cds(z, s):
    """Compensated scalar multiply of a complex-DS tuple by f64 ``s``
    (exact when s is a power of two; ~2^-48 otherwise)."""
    s = float(s)
    s_hi = np.float32(s)
    s_lo = np.float32(s - np.float64(s_hi))
    sc = (jnp.float32(s_hi), jnp.float32(s_lo))
    return (ds_mul(z[0], sc), ds_mul(z[1], sc))


def scale_ds(q, s):
    """Compensated scalar multiply of a planar-DS array by f64 ``s``."""
    return _pack_cds(_scale_cds(_unpack_cds(q), s))


# ---------------------------------------------------------------------------
# multi-axis driver
# ---------------------------------------------------------------------------

def fftn_ds(q, axes, forward=True, scale=None, interpret=None):
    """c2c over ``axes`` of planar-DS ``(2, 2)+S`` data; unnormalized
    unless ``scale`` (compensated elementwise pass) is given."""
    for ax in axes:
        q = fft_axis_ds(q, ax, forward, interpret=interpret)
    if scale is not None:
        q = scale_ds(q, scale)
    return q


# ---------------------------------------------------------------------------
# packed-real r2c / c2r (Makhoul N/2-point method, DS throughout)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _rfft_tw_ds(N, inverse):
    """Untangle twiddles, f64-built and split to DS rows (2, 2, H+1):
    forward: -(i/2) e^{-2 pi i k / N};  inverse: e^{+2 pi i k / N}."""
    H = N // 2
    k = np.arange(H + 1)
    w = np.exp((+2j if inverse else -2j) * np.pi * k / N)
    if not inverse:
        w *= -0.5j
    c = np.stack([w.real, w.imag])              # (2, H+1) f64
    hi = c.astype(np.float32)
    lo = (c - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo], axis=1)           # (2, 2, H+1)


def _tw_bcast(tw, ndim_rest):
    """(2, 2, T) -> complex-DS tuple of rows broadcastable over rest."""
    t = jnp.asarray(tw).reshape((2, 2, tw.shape[2]) + (1,) * ndim_rest)
    return _unpack_cds(t)


def supported_rfft_ds(shape, axis):
    """Gate for the packed-real pair: even pow-2 extent whose HALF still
    meets the c2c kernel gate."""
    nd = len(shape)
    axis = axis % nd
    N = shape[axis]
    if N < 4 or N % 2:
        return False
    half = list(shape)
    half[axis] = N // 2
    return supported_ds(tuple(half), axis)


def rfft_axis_ds(x, axis=0, interpret=None, hext=None):
    """Real-DS ``(2,)+S`` -> half-spectrum planar-DS ``(2, 2)+S'`` with
    ``S'[axis] = N//2+1`` (zero rows appended up to ``hext`` when
    given).  Unnormalized FFTW r2c semantics at DS precision: the even/
    odd samples are packed into one N/2-point c2c kernel pass and the
    spectrum untangled with DS twiddles (the method of the f32 packed
    kernel, ops/pallas_butterfly.py, carried out in two-float32)."""
    nd = x.ndim - 1
    axis = axis % nd
    N = x.shape[1 + axis]
    H = N // 2
    x = jnp.moveaxis(x, 1 + axis, 1)            # (2, N, rest)
    # pack: z[n] = x[2n] + i x[2n+1] — one strided gather
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    q = jnp.stack([xe, xo])                     # (2=cplx, 2=ds, H, rest)
    Z = fft_axis_ds(q, 0, True, interpret=interpret)
    z = _unpack_cds(Z)

    # A[k] = Z[k mod H], B[k] = conj(Z[(H-k) mod H]), k = 0..H — built
    # from slice + reverse + concat (XLA fuses these; index gathers pay
    # full relayout passes on TPU)
    def amap(v):
        return jnp.concatenate([v, v[:1]], axis=0)

    def bmap(v):
        return jnp.concatenate([v[:1], jnp.flip(v[1:], axis=0), v[:1]],
                               axis=0)

    def lift(t, f):
        return tuple(tuple(f(v) for v in comp) for comp in t)

    A = lift(z, amap)
    B = _cconj(lift(z, bmap))
    # X[k] = (A+B)/2 + W[k] (A-B),  W = -(i/2) e^{-2 pi i k/N}
    S = _scale_cds(_cadd(A, B), 0.5)
    D = _csub(A, B)
    W = _tw_bcast(_rfft_tw_ds(N, inverse=False), x.ndim - 2)
    X = _cadd(S, _cmul(D, W))
    out = _pack_cds(X)                          # (2, 2, H+1, rest)
    if hext is not None and hext > H + 1:
        pad = [(0, 0)] * out.ndim
        pad[2] = (0, hext - (H + 1))
        out = jnp.pad(out, pad)
    return jnp.moveaxis(out, 2, 2 + axis)


def irfft_axis_ds(p, axis, n, scale=None, interpret=None):
    """Half-spectrum planar-DS ``(2, 2)+S'`` -> real-DS ``(2,)+S`` with
    ``S[axis] = n``; rows beyond ``n//2+1`` (shardable-extent padding)
    are ignored.  Unnormalized FFTW c2r semantics at DS precision;
    ``scale`` is a compensated elementwise pass on the output."""
    nd = p.ndim - 2
    axis = axis % nd
    N = int(n)
    H = N // 2
    p = jnp.moveaxis(p, 2 + axis, 2)            # (2, 2, nh, rest)
    p = p[:, :, :H + 1]
    X = _unpack_cds(p)

    # X[k] (k = 0..H-1) and conj(X[H-k]) via slice + reverse + concat
    # (no index gathers — see rfft_axis_ds)
    def kmap(v):
        return v[:H]

    def rmap(v):
        return jnp.concatenate([v[H:H + 1], jnp.flip(v[1:H], axis=0)],
                               axis=0)

    def lift(t, f):
        return tuple(tuple(f(v) for v in comp) for comp in t)

    Xk = lift(X, kmap)
    Xr = _cconj(lift(X, rmap))
    # E = Xk + conj(X[H-k]);  O = (Xk - conj(X[H-k])) e^{+2 pi i k/N}
    E = _cadd(Xk, Xr)
    W = _tw_bcast(_rfft_tw_ds(N, inverse=True)[:, :, :H], p.ndim - 3)
    O = _cmul(_csub(Xk, Xr), W)
    # Z = E + i O: (Er - Oi) + i (Ei + Or)
    Z = (ds_sub(E[0], O[1]), ds_add(E[1], O[0]))
    y = fft_axis_ds(_pack_cds(Z), 0, False, interpret=interpret)
    yz = _unpack_cds(y)                         # re = x[2n], im = x[2n+1]
    if scale is not None:
        yz = _scale_cds(yz, scale)
    # interleave: (2=ds, H, 2, rest) -> (2, N, rest)
    re = jnp.stack(yz[0])                       # (2, H, rest)
    im = jnp.stack(yz[1])
    out = jnp.stack([re, im], axis=2)           # (2, H, 2, rest)
    out = out.reshape((2, N) + out.shape[3:])
    return jnp.moveaxis(out, 1, 1 + axis)
