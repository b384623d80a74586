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

Status: prototype tier (lead-axis kernel, radix-4/2 plans, N a power of
two).  Measured accuracy/throughput: scripts/tpu_ds_probe.py →
docs/precision.md.  Role: the performance-bearing analogue of the
reference's double-precision FFTW build (reference: setup.py:83-141).
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_butterfly import _bspec, _is_pow2

__all__ = ['to_ds', 'from_ds', 'supported_ds', 'fft_axis_ds']

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


def supported_ds(shape, axis):
    """Gate for :func:`fft_axis_ds` — prototype scope: lead axis of a
    power-of-two extent with lane-tileable trailing volume."""
    nd = len(shape)
    if axis % nd != 0:
        return False
    N = shape[0]
    if not _is_pow2(N) or N > _MAX_N_DS:
        return False
    post = int(np.prod(shape[1:], dtype=np.int64)) if nd > 1 else 1
    return post % (_SUB * _LANE) == 0


@functools.partial(jax.jit, static_argnames=('sign', 'interpret'))
def _dispatch_ds(p, sign, interpret):
    shape = p.shape[2:]
    N = shape[0]
    post = int(np.prod(shape[1:], dtype=np.int64))
    tw_small = jnp.asarray(_tw_pack_ds(N, sign))
    tw = jnp.broadcast_to(tw_small[:, :, :, None, None],
                          (2, 2, tw_small.shape[2], _SUB, _LANE))
    tw_spec = _bspec((2, 2, tw_small.shape[2], _SUB, _LANE),
                     lambda i: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    x = p.reshape(2, 2, N, post // _LANE, _LANE)
    kw = {}
    if not interpret:
        kw['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2 ** 20)
    out = pl.pallas_call(
        functools.partial(_kern_lead_ds, N=N, sign=sign),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(post // (_SUB * _LANE),),
        in_specs=[_bspec((2, 2, N, _SUB, _LANE),
                         lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM), tw_spec],
        out_specs=_bspec((2, 2, N, _SUB, _LANE),
                         lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        interpret=interpret,
        **kw,
    )(x, tw)
    return out.reshape(p.shape)


def fft_axis_ds(p, axis=0, forward=True, interpret=None):
    """Unnormalized c2c FFT along ``axis`` of planar-DS data
    ``(2, 2) + shape`` at double-single precision.  Prototype: the
    transform axis is moved to the lead position (XLA relayout) when
    ``axis != 0``."""
    nd = p.ndim - 2
    axis = axis % nd
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    if axis != 0:
        p = jnp.moveaxis(p, 2 + axis, 2)
    out = _dispatch_ds(p, -1 if forward else +1, interpret)
    if axis != 0:
        out = jnp.moveaxis(out, 2, 2 + axis)
    return out
