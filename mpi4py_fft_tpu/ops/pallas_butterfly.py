"""Pallas TPU kernel: Stockham mixed radix-4/2 FFT over any axis, pure VPU.

The matmul engine (ops/matfft.py) computes DFTs as MXU contractions —
radix-R stages cost R MACs per element (R >> log2 R), and every stage
round-trips HBM.  This kernel instead runs the textbook O(N log N)
butterfly data-flow entirely inside VMEM: one HBM read, ~log4(N) Stockham
radix-4 stages on the VPU, one HBM write — the two unavoidable passes —
at full f32 precision (no MXU bf16 rounding).  Replaces the role of
FFTW's codelet generator for power-of-two sizes (reference:
mpi4py_fft/fftw/fftw_planxfftn.c and libfftw behind it).

Stockham autosort recurrence (DIF, self-sorting — no bit reversal):

    state S has shape (L, M): L = remaining transform length, M = number
    of interleaved sub-transforms (L*M = N, M doubles each stage).
    With w_L = exp(sign*2i*pi/L):
        a = S[:L/2] + S[L/2:]
        b = (S[:L/2] - S[L/2:]) * w_L**arange(L/2)   (per-row twiddle)
        S <- concat([a, b], axis=1)                  # (L/2, 2M)
    After log2(N) stages S is (1, N) and the M index IS the output
    frequency in natural order (sub-transform j of an (L, M) state
    computes the frequencies k = k_local*M + j).

Mosaic mapping: the transform axis is placed in the *leading* (non-tiled)
position of an (N, M, 8, 128) state — the trailing (sublane, lane) tile
is an (8, 128) chunk of the *other* axes and is never touched, so every
slice/concat is a whole-tile page operation and no relayout padding
occurs.  Axis positioning uses only probed-legal moves on this toolchain:
last-two-dim swaps, leading<->sublane 3-D transposes, and lane splits
(B, 1024) -> (B, 8, 128).  Stage twiddles arrive as one page-broadcast
input (2, T, 8, 128) whose block index is grid-constant, so the
pipeline DMAs it once and it stays VMEM-resident across steps.

Complex data is planar throughout: (2, ...) real arrays (see matfft.py).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fft_axis_p', 'supported_axis']

_LANE = 128
_SUB = 8
_MAX_N = 256           # VMEM bound: tile + twiddle pack + state temps


def _is_pow2(n):
    return n >= 2 and (n & (n - 1)) == 0


@functools.lru_cache(maxsize=None)
def _stage_plan(N):
    """Radices per Stockham stage: radix-4 throughout, with one leading
    radix-2 when log2(N) is odd.  Fewer stages = fewer full-state VMEM
    round-trips (the dominant in-kernel cost)."""
    plan = []
    L = N
    if (L.bit_length() - 1) % 2:
        plan.append(2)
        L //= 2
    while L > 1:
        plan.append(4)
        L //= 4
    return tuple(plan)


@functools.lru_cache(maxsize=None)
def _tw_pack(N, sign, dtype_str):
    """All stage twiddles, page-broadcast: (2, T, 8, 128).

    Per _stage_plan stage of radix r at length L, rows hold
    w_L^(j*l) for j = 1..r-1 concatenated (l < L/r), descending L.
    Returned as (2, T); the caller broadcasts to pages.
    """
    rows_r, rows_i = [], []
    L = N
    for r in _stage_plan(N):
        Lq = L // r
        for j in range(1, r):
            ang = sign * 2.0 * np.pi * j * np.arange(Lq) / L
            rows_r.append(np.cos(ang))
            rows_i.append(np.sin(ang))
        L //= r
    cr = np.concatenate(rows_r)
    ci = np.concatenate(rows_i)
    # small (2, T) literal; the page broadcast happens at run time so the
    # HLO carries ~2KB instead of a 1MB constant (remote compiles upload
    # and fold literals; big ones made pipeline compiles pathological)
    return np.stack([cr, ci]).astype(dtype_str)


def _butterfly(xr, xi, tw_ref, N, sign, scale=None):
    """Stockham mixed radix-4/2 over the leading axis of (N, 8, 128)
    pairs.  Sub-transform j of an (L, M) state computes frequencies
    k = k_local*M + j; a radix-r stage splits k_local = r*k'' + rr and
    deposits result rr at the new sub-transform index rr*M + j — plain
    concatenation along the M axis keeps the output self-sorted."""
    # state (L, M, 8, 128); inserting the M axis is leading-dim metadata
    xr = xr[:, None]
    xi = xi[:, None]
    L = N
    off = 0
    for r in _stage_plan(N):
        Lq = L // r
        if r == 2:
            ar, br = xr[:Lq], xr[Lq:]
            ai, bi = xi[:Lq], xi[Lq:]
            sr, si = ar + br, ai + bi
            dr, di = ar - br, ai - bi
            if L == 2:
                tr, ti = dr, di          # w = 1
            else:
                twr = tw_ref[0, off:off + Lq][:, None]
                twi = tw_ref[1, off:off + Lq][:, None]
                tr = dr * twr - di * twi
                ti = dr * twi + di * twr
            xr = jnp.concatenate([sr, tr], axis=1)
            xi = jnp.concatenate([si, ti], axis=1)
        else:
            q0r, q1r = xr[:Lq], xr[Lq:2 * Lq]
            q2r, q3r = xr[2 * Lq:3 * Lq], xr[3 * Lq:]
            q0i, q1i = xi[:Lq], xi[Lq:2 * Lq]
            q2i, q3i = xi[2 * Lq:3 * Lq], xi[3 * Lq:]
            t0r, t0i = q0r + q2r, q0i + q2i
            t1r, t1i = q1r + q3r, q1i + q3i
            t2r, t2i = q0r - q2r, q0i - q2i
            t3r, t3i = q1r - q3r, q1i - q3i
            # w4 = exp(sign*i*pi/2): w4*z = (-sign*zi, sign*zr)
            u3r, u3i = -sign * t3i, sign * t3r
            y0r, y0i = t0r + t1r, t0i + t1i
            y2r, y2i = t0r - t1r, t0i - t1i
            y1r, y1i = t2r + u3r, t2i + u3i
            y3r, y3i = t2r - u3r, t2i - u3i
            if L == 4:
                xr = jnp.concatenate([y0r, y1r, y2r, y3r], axis=1)
                xi = jnp.concatenate([y0i, y1i, y2i, y3i], axis=1)
            else:
                w1r = tw_ref[0, off:off + Lq][:, None]
                w1i = tw_ref[1, off:off + Lq][:, None]
                w2r = tw_ref[0, off + Lq:off + 2 * Lq][:, None]
                w2i = tw_ref[1, off + Lq:off + 2 * Lq][:, None]
                w3r = tw_ref[0, off + 2 * Lq:off + 3 * Lq][:, None]
                w3i = tw_ref[1, off + 2 * Lq:off + 3 * Lq][:, None]
                xr = jnp.concatenate(
                    [y0r,
                     y1r * w1r - y1i * w1i,
                     y2r * w2r - y2i * w2i,
                     y3r * w3r - y3i * w3i], axis=1)
                xi = jnp.concatenate(
                    [y0i,
                     y1r * w1i + y1i * w1r,
                     y2r * w2i + y2i * w2r,
                     y3r * w3i + y3i * w3r], axis=1)
        off += (r - 1) * Lq
        L = Lq
    if scale is not None:
        xr = xr * scale
        xi = xi * scale
    return xr[0], xi[0]              # (N, 8, 128)


# ---------------------------------------------------------------------------
# kernel bodies (one per axis position)
# ---------------------------------------------------------------------------

def _kern_mid(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Transform the sublane-adjacent middle axis: block (2, 8, N, 128)."""
    xr = jnp.transpose(x_ref[0], (1, 0, 2))   # (N, 8, 128) lead<->sublane
    xi = jnp.transpose(x_ref[1], (1, 0, 2))
    r, i = _butterfly(xr, xi, tw_ref, N, sign, scale)
    o_ref[0] = jnp.transpose(r, (1, 0, 2))
    o_ref[1] = jnp.transpose(i, (1, 0, 2))


def _kern_last(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Transform the lane (last) axis: block (2, R, N), R = 1024."""
    R = x_ref.shape[1]
    xs = []
    for p in range(2):
        x = jnp.swapaxes(x_ref[p], 0, 1)      # (N, R) full 2-D transpose
        xs.append(x.reshape(N, R // _LANE, _LANE))   # lane split
    r, i = _butterfly(xs[0], xs[1], tw_ref, N, sign, scale)
    o_ref[0] = jnp.swapaxes(r.reshape(N, R), 0, 1)
    o_ref[1] = jnp.swapaxes(i.reshape(N, R), 0, 1)


def _kern_lead(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Transform the leading axis: block (2, N, Q), Q = 1024."""
    Q = x_ref.shape[2]
    xr = x_ref[0].reshape(N, Q // _LANE, _LANE)   # lane split; N leading
    xi = x_ref[1].reshape(N, Q // _LANE, _LANE)
    r, i = _butterfly(xr, xi, tw_ref, N, sign, scale)
    o_ref[0] = r.reshape(N, Q)
    o_ref[1] = i.reshape(N, Q)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def supported_axis(shape, axis, dtype):
    """True if ``fft_axis_p`` has a kernel for this (shape, axis, dtype).

    shape is the complex shape (no planar dim); f32 only (f64 is emulated
    on TPU and stays on the einsum engine).
    """
    if np.dtype(dtype) != np.float32:
        return False
    nd = len(shape)
    axis = axis % nd
    N = shape[axis]
    if not _is_pow2(N) or N > _MAX_N:
        return False
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    if post == 1:
        return pre % (_SUB * _LANE) == 0
    if pre == 1:
        return post % (_SUB * _LANE) == 0
    return pre % _SUB == 0 and post % _LANE == 0


@functools.partial(jax.jit,
                   static_argnames=('axis', 'sign', 'interpret', 'scale'))
def _dispatch(p, axis, sign, interpret, scale):
    shape = p.shape[1:]
    nd = len(shape)
    N = shape[axis]
    dtype_str = np.dtype(p.dtype).name
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    tw_small = jnp.asarray(_tw_pack(N, sign, dtype_str))
    tw = jnp.broadcast_to(tw_small[:, :, None, None],
                          (2, tw_small.shape[1], _SUB, _LANE))
    tw_spec = pl.BlockSpec((2, tw_small.shape[1], _SUB, _LANE),
                           lambda *g: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    if post == 1:
        x = p.reshape(2, pre, N)
        R = _SUB * _LANE
        out = pl.pallas_call(
            functools.partial(_kern_last, N=N, sign=sign, scale=scale),
            out_shape=jax.ShapeDtypeStruct((2, pre, N), p.dtype),
            grid=(pre // R,),
            in_specs=[pl.BlockSpec((2, R, N), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=pl.BlockSpec((2, R, N), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, tw)
    elif pre == 1:
        x = p.reshape(2, N, post)
        Q = _SUB * _LANE
        out = pl.pallas_call(
            functools.partial(_kern_lead, N=N, sign=sign, scale=scale),
            out_shape=jax.ShapeDtypeStruct((2, N, post), p.dtype),
            grid=(post // Q,),
            in_specs=[pl.BlockSpec((2, N, Q), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=pl.BlockSpec((2, N, Q), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, tw)
    else:
        x = p.reshape(2, pre, N, post)
        out = pl.pallas_call(
            functools.partial(_kern_mid, N=N, sign=sign, scale=scale),
            out_shape=jax.ShapeDtypeStruct((2, pre, N, post), p.dtype),
            grid=(pre // _SUB, post // _LANE),
            in_specs=[pl.BlockSpec((2, _SUB, N, _LANE),
                                   lambda i, j: (0, i, 0, j),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=pl.BlockSpec((2, _SUB, N, _LANE),
                                   lambda i, j: (0, i, 0, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, tw)
    return out.reshape(p.shape)


def fft_axis_p(p, axis, forward=True, interpret=None, scale=None):
    """Planar c2c FFT along ``axis`` (complex coords) of (2, ...) data.

    Requires ``supported_axis(p.shape[1:], axis, p.dtype)``.  Unnormalized
    unless ``scale`` is given (applied in-VMEM in the final stage — saves
    the separate normalization HBM pass).  forward=False is the unscaled
    inverse.  2 HBM passes, VPU butterflies.
    """
    nd = p.ndim - 1
    axis = axis % nd
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    sign = -1 if forward else +1
    return _dispatch(p, axis, sign, interpret,
                     None if scale is None else float(scale))
