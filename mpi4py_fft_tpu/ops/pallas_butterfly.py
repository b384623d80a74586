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

__all__ = ['fft_axis_p', 'supported_axis', 'rfft_axis_p',
           'irfft_axis_p', 'supported_c2r', 'fft_plane_p',
           'supported_plane', 'fft_plane_large_p', 'supported_plane_large',
           'fft_axis2_p', 'supported_axis_split', 'fft_axis_pair_p',
           'fft_axis_tp', 'supported_axis_tp', 'fused_tp_enabled']

_LANE = 128
_SUB = 8
_MAX_N = 256           # fused-2-axis / packed-real bound (tile + twiddles)
# c2c axis kernels go longer: at N=512/1024 the (block + twiddle pack +
# stage temps) working set still fits v5e VMEM with a raised
# vmem_limit_bytes (probed on hardware, scripts/tpu_longN_probe.py).
# This is what lets the 1024^3 north-star run fused on one 16 GB chip —
# the four-step einsum fallback materializes a 16 GB HLO temp and OOMs.
_MAX_N_AXIS = 1024


def _bspec(shape, imap, memory_space=None):
    """BlockSpec whose index map yields int32 block indices.

    Under ``jax_enable_x64`` (this package's default, for f64 parity
    with the reference) raw index maps produce i64 indices, which the
    Mosaic pipeline fails to legalize ('failed to legalize operation
    func.return' from the remote compiler) — probed on hardware; the
    kernels themselves are f32-only and unaffected."""
    def g(*args):
        return tuple(jnp.asarray(v, jnp.int32) for v in imap(*args))
    return pl.BlockSpec(shape, g, memory_space=memory_space)

import os as _os
# last-axis kernel variant: '1' = (1024, N) 2-D transpose, '2' = two
# tile-local moves on (8, 128, N) blocks.  A/B-tested on hardware:
# '1' wins at N <= 256, '2' wins at N >= 512 (521 vs 554 GB/s at 1024,
# scripts/tpu_longN_probe.py) — 'auto' picks per N.
_LAST_VARIANT = _os.environ.get('MPI4PY_FFT_TPU_LAST_VARIANT', 'auto')


def _last_variant(N):
    if _LAST_VARIANT == 'auto':
        return '2' if N >= 512 else '1'
    return _LAST_VARIANT
# wide (multi-lane-tile) blocks for the lead/mid axis kernels: HBM
# chunks of W/128 adjacent lane tiles (8 KB at W=256) instead of 4 KB.
# A/B'd OFF on v5e: although a pure COPY at (2,N,8,256) runs 652 vs
# 602 GB/s (scripts/tpu_blockshape_probe.py), the butterfly at wide
# blocks REGRESSED (mid 29.5 -> 35.2 ms, lead 27.4 -> 31.9 ms at
# 1024^3) — the per-128-lane-half butterfly loop defeats DMA/compute
# overlap.  'auto' (= off today) keeps the door open; 'on' forces wide.
_WIDE = _os.environ.get('MPI4PY_FFT_TPU_WIDE', 'auto')
_WIDE_W = 2 * _LANE


def _wide_ok(post):
    return _WIDE == 'on' and post % _WIDE_W == 0


# in-place HBM update: alias each c2c axis pass's input buffer to its
# output (the block index maps are identity, so every grid step reads and
# writes the same HBM block).  In a fused pipeline whose intermediates
# are dead after use this halves the live-volume count — required for
# 1024^3 (two 8.6 GB planar volumes exceed the 15.75 GB HBM).  XLA
# inserts a protective copy iff the caller's input is still live.
#
# BUT aliasing costs ~30% HBM bandwidth: measured on v5e, an OOP
# butterfly pass runs 836 GB/s r+w vs 579 in-place at 512^3, and OOP
# copies hit 903-1019 GB/s vs 602-661 aliased
# (scripts/tpu_vpu_probe.py, scripts/tpu_blockshape_probe.py).  So
# 'on' (default) aliases ONLY volumes big enough that an out-of-place
# ping-pong pair would threaten the ~16 GB HBM; smaller passes run
# out-of-place at the fast rate.  'force' always aliases, 'off' never.
_INPLACE = _os.environ.get('MPI4PY_FFT_TPU_INPLACE', 'on')
_INPLACE_MIN = float(_os.environ.get('MPI4PY_FFT_TPU_INPLACE_MIN_GB',
                                     '4.0')) * 1e9


def _alias(nbytes=None, oop=None):
    """``oop`` (tri-state) lets a schedule override the env policy per
    call: True = never alias (the caller guarantees the ping-pong pair
    fits HBM), False = always alias, None = env/size-gated default."""
    if oop is True:
        return {}
    if oop is False:
        return {0: 0}
    if _INPLACE == 'off':
        return {}
    if _INPLACE == 'force' or nbytes is None:
        return {0: 0}
    return {0: 0} if nbytes >= _INPLACE_MIN else {}


def _cparams(N, mb=None):
    """Compiler params per transform length: long-N kernels need a raised
    VMEM budget (block + twiddle pack + ~3 live stage states)."""
    if mb is None:
        if N <= 256:
            return None
        mb = 96 if N <= 512 else 120
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 2 ** 20)


def _pcall(kern, x, tw, block, imap, tw_spec, grid, N, interpret, mb=None,
           oop=None):
    """Shared pallas_call wrapper for the c2c axis kernels: identical
    in/out blocking, optional in-place aliasing, per-N VMEM budget."""
    kw = {}
    cp = _cparams(N, mb)
    if cp is not None and not interpret:
        kw['compiler_params'] = cp
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[_bspec(block, imap, memory_space=pltpu.VMEM), tw_spec],
        out_specs=_bspec(block, imap, memory_space=pltpu.VMEM),
        input_output_aliases=_alias(x.size * x.dtype.itemsize, oop)
        if not interpret else {},
        interpret=interpret,
        **kw,
    )(x, tw)


# lead-axis variant: '1' = (2, N, 1024) block + in-kernel lane split,
# '2' = native (2, N, 8, 128) blocks (no in-kernel relayout),
# '3' = (2, N, 16, 128) blocks — doubles the HBM chunk size to 8 KiB.
# A/B on hardware (scripts/tpu_plane_test.py): although a pure COPY at
# sub=16 is 1.8x faster than sub=8 (0.50 vs 0.88 ms / 256 MiB), the FFT
# kernel at sub=16 loses DMA/compute overlap (4 MiB blocks + butterfly
# temps exceed the default VMEM budget) and lands at 2.3 ms vs 0.97 ms —
# variant 2 stays the default.
_LEAD_VARIANT = _os.environ.get('MPI4PY_FFT_TPU_LEAD_VARIANT', '2')


def _is_pow2(n):
    return n >= 2 and (n & (n - 1)) == 0


def _supported_len(n):
    """Kernel-supported transform lengths: 2^a, or 3*2^a (one radix-3
    stage) — the latter covers the 3/2-rule dealiasing extents
    (e.g. 768 = 1.5*512), which would otherwise fall back to the einsum
    engine (reference: libfft.py padding semantics)."""
    if _is_pow2(n):
        return True
    return n % 3 == 0 and _is_pow2(n // 3)


# Stockham stage-radix plan override, e.g. '8,8,16' (must multiply to N).
# The in-kernel cost is dominated by full-state VMEM sweeps — one per
# stage — so higher radices (an in-register R-point DFT per group) cut
# sweeps at slightly more arithmetic per element.  A/B'd on hardware via
# scripts/tpu_radix_ab.py; defaults below encode the winners.
_STAGE_PLAN_ENV = _os.environ.get('MPI4PY_FFT_TPU_STAGE_PLAN', '')


@functools.lru_cache(maxsize=None)
def _stage_plan(N):
    """Radices per Stockham stage (each a power of two <= 32)."""
    if _STAGE_PLAN_ENV:
        plan = tuple(int(t) for t in _STAGE_PLAN_ENV.split(','))
        # first stage must be even: _butterfly2's split-pair entry
        # assumes the leading radix divides the half-length (a leading
        # radix-3 would trip `h % Lq` deep in tracing with an opaque
        # assert) — reorder any radix-3 stage to the end instead
        if int(np.prod(plan)) == N and \
                all(_is_pow2(r) or r == 3 for r in plan) and \
                plan[0] % 2 == 0:
            return plan
    return _default_plan(N)


def _default_plan(N):
    """Measured-default stage plan: radix-16 stages with one small
    remainder stage LAST.

    v5e slope-fitted per-pass A/B (scripts/tpu_radix_ab.py): mid-axis
    pass 31.9 ms (4,4,4,4,4) -> 29.2/29.3 ms (8,8,16 / 16,16,4) at
    1024^3; 3.60 -> 3.29 ms (16,16,2) at 512^3.  Stage order matters:
    the same radix multiset ordered big-first-with-8s (16,8,8)
    REGRESSED to 35.4 ms — keep the small remainder stage last.
    Radix-32 (32,32: 31.1 ms) also loses.  At N <= 256 the relation
    FLIPS: (4,4,4,4) 0.411 ms vs (16,16) 0.512 at 256^3 — short
    transforms are DMA-bound and radix-16's extra in-register
    arithmetic only hurts, so the 16-plans apply at N >= 512 only.

    Lengths 3*2^a take one radix-3 stage appended to the pow2 plan
    (covers the 3/2-dealiasing extents, e.g. 768); the 16-vs-4 choice
    for the pow2 part keys on the FULL length N (the compute/DMA
    balance scales with N, not with the pow2 factor alone)."""
    M, tail = (N // 3, (3,)) if N % 3 == 0 else (N, ())
    if N >= 512:
        plan = []
        L = M
        while L >= 16:
            plan.append(16)
            L //= 16
        if L > 1:
            plan.append(L)
        return tuple(plan) + tail
    plan = []
    L = M
    if (L.bit_length() - 1) % 2:
        plan.append(2)
        L //= 2
    while L > 1:
        plan.append(4)
        L //= 4
    return tuple(plan) + tail


@functools.lru_cache(maxsize=None)
def _tw_len(N):
    """Row count of _tw_pack(N, ...)."""
    t, L = 0, N
    for r in _stage_plan(N):
        t += (r - 1) * (L // r)
        L //= r
    return t


@functools.lru_cache(maxsize=None)
def _tw_pack_packed(N, sign, dtype_str):
    """Twiddles for the PACKED r2c/c2r kernels: the N/2-point stage pack
    with (cos, sin)(2*pi*k/N), k = 0..N/2, appended as unpack rows."""
    N2 = N // 2
    base = _tw_pack(N2, sign, dtype_str)         # (2, T2)
    k = np.arange(N2 + 1)
    ang = 2.0 * np.pi * k / N
    extra = np.stack([np.cos(ang), np.sin(ang)]).astype(dtype_str)
    return np.concatenate([base, extra], axis=1)


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


def _dft_slabs(qs, sign):
    """R-point DFT across a list of (re, im) slab pairs, computed as a
    recursive radix-2 Cooley-Tukey network whose twiddles are Python
    float constants — the whole R-point transform runs between two
    full-state materializations (one VMEM sweep instead of log2(R))."""
    import math
    R = len(qs)
    if R == 1:
        return qs
    ev = _dft_slabs(qs[0::2], sign)
    od = _dft_slabs(qs[1::2], sign)
    H = R // 2
    out = [None] * R
    for k in range(H):
        er, ei = ev[k]
        orr, oi = od[k]
        if k == 0:                      # w = 1
            tr, ti = orr, oi
        elif 4 * k == R:                # w = exp(sign*i*pi/2)
            tr, ti = -sign * oi, sign * orr
        else:
            ang = sign * 2.0 * math.pi * k / R
            wr, wi = math.cos(ang), math.sin(ang)
            tr = orr * wr - oi * wi
            ti = orr * wi + oi * wr
        out[k] = (er + tr, ei + ti)
        out[k + H] = (er - tr, ei - ti)
    return out


def _stage_apply(qr, qi, r, L, off, tw_ref, sign):
    """One Stockham stage from r input slabs (each (Lq, M, ...)) to the
    concatenated (Lq, r*M, ...) state.  Slab j = state[j*Lq:(j+1)*Lq];
    callers slice (or, for the split-pair kernels, gather slabs across
    two input refs without materializing an input concat)."""
    Lq = L // r
    if r == 2:
        ar, br = qr[0], qr[1]
        ai, bi = qi[0], qi[1]
        sr, si = ar + br, ai + bi
        dr, di = ar - br, ai - bi
        if L == 2:
            tr, ti = dr, di          # w = 1
        else:
            twr = tw_ref[0, off:off + Lq][:, None]
            twi = tw_ref[1, off:off + Lq][:, None]
            tr = dr * twr - di * twi
            ti = dr * twi + di * twr
        return (jnp.concatenate([sr, tr], axis=1),
                jnp.concatenate([si, ti], axis=1))
    if r == 3:
        q0r, q1r, q2r = qr
        q0i, q1i, q2i = qi
        # w3 = exp(sign*2i*pi/3) = c + i*s; w3^2 = conj(w3)
        c = -0.5
        s = sign * 0.8660254037844386          # sqrt(3)/2
        ar, ai = q1r + q2r, q1i + q2i           # q1 + q2
        br, bi = q1r - q2r, q1i - q2i           # q1 - q2
        y0r, y0i = q0r + ar, q0i + ai
        y1r = q0r + c * ar - s * bi
        y1i = q0i + c * ai + s * br
        y2r = q0r + c * ar + s * bi
        y2i = q0i + c * ai - s * br
        if L == 3:
            return (jnp.concatenate([y0r, y1r, y2r], axis=1),
                    jnp.concatenate([y0i, y1i, y2i], axis=1))
        w1r = tw_ref[0, off:off + Lq][:, None]
        w1i = tw_ref[1, off:off + Lq][:, None]
        w2r = tw_ref[0, off + Lq:off + 2 * Lq][:, None]
        w2i = tw_ref[1, off + Lq:off + 2 * Lq][:, None]
        return (jnp.concatenate(
                    [y0r,
                     y1r * w1r - y1i * w1i,
                     y2r * w2r - y2i * w2i], axis=1),
                jnp.concatenate(
                    [y0i,
                     y1r * w1i + y1i * w1r,
                     y2r * w2i + y2i * w2r], axis=1))
    if r >= 8:
        ys = _dft_slabs(list(zip(qr, qi)), sign)
        outs_r, outs_i = [ys[0][0]], [ys[0][1]]
        for k in range(1, r):
            yr, yi = ys[k]
            if L == r:              # final stage of this length: w = 1
                outs_r.append(yr)
                outs_i.append(yi)
            else:
                wr = tw_ref[0, off + (k - 1) * Lq:off + k * Lq][:, None]
                wi = tw_ref[1, off + (k - 1) * Lq:off + k * Lq][:, None]
                outs_r.append(yr * wr - yi * wi)
                outs_i.append(yr * wi + yi * wr)
        return (jnp.concatenate(outs_r, axis=1),
                jnp.concatenate(outs_i, axis=1))
    q0r, q1r, q2r, q3r = qr
    q0i, q1i, q2i, q3i = qi
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
        return (jnp.concatenate([y0r, y1r, y2r, y3r], axis=1),
                jnp.concatenate([y0i, y1i, y2i, y3i], axis=1))
    w1r = tw_ref[0, off:off + Lq][:, None]
    w1i = tw_ref[1, off:off + Lq][:, None]
    w2r = tw_ref[0, off + Lq:off + 2 * Lq][:, None]
    w2i = tw_ref[1, off + Lq:off + 2 * Lq][:, None]
    w3r = tw_ref[0, off + 2 * Lq:off + 3 * Lq][:, None]
    w3i = tw_ref[1, off + 2 * Lq:off + 3 * Lq][:, None]
    return (jnp.concatenate(
                [y0r,
                 y1r * w1r - y1i * w1i,
                 y2r * w2r - y2i * w2i,
                 y3r * w3r - y3i * w3i], axis=1),
            jnp.concatenate(
                [y0i,
                 y1r * w1i + y1i * w1r,
                 y2r * w2i + y2i * w2r,
                 y3r * w3i + y3i * w3r], axis=1))


def _finish(xr, xi, scale):
    if scale is not None:
        xr = xr * scale
        xi = xi * scale
    return xr[0], xi[0]              # (N, 8, 128)


def _butterfly(xr, xi, tw_ref, N, sign, scale=None):
    """Stockham mixed-radix FFT over the leading axis of (N, 8, 128)
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
        qr = [xr[j * Lq:(j + 1) * Lq] for j in range(r)]
        qi = [xi[j * Lq:(j + 1) * Lq] for j in range(r)]
        xr, xi = _stage_apply(qr, qi, r, L, off, tw_ref, sign)
        off += (r - 1) * Lq
        L = Lq
    return _finish(xr, xi, scale)


def _trunc_rows(v, N, Nt):
    """Reference spectral truncation (libfft.truncate_planar,
    non-hermitian) on the frequency-major (N, ...) state: keep the
    lowest |k| modes, folding the Nyquist pair for even Nt
    (reference: libfft.py:263-284)."""
    if Nt % 2 == 0:
        h = Nt // 2
        return jnp.concatenate(
            [v[:h], v[h:h + 1] + v[N - h:N - h + 1], v[N - h + 1:]],
            axis=0)
    m = Nt // 2
    return jnp.concatenate([v[:m + 1], v[N - m:]], axis=0)


def _pad_rows(v, N, Nt):
    """Reference spectral zero-padding (libfft.pad_planar,
    non-hermitian) on the frequency-major (Nt, ...) state: symmetric
    Fourier interpolator, Nyquist split in half for even Nt
    (reference: libfft.py:286-311)."""
    if Nt % 2 == 0:
        h = Nt // 2
        half = v[h:h + 1] * 0.5
        z = jnp.zeros((N - Nt - 1,) + v.shape[1:], v.dtype)
        return jnp.concatenate([v[:h], half, z, half, v[h + 1:]], axis=0)
    m = Nt // 2
    z = jnp.zeros((N - Nt,) + v.shape[1:], v.dtype)
    return jnp.concatenate([v[:m + 1], z, v[m + 1:]], axis=0)


def _butterfly2(ra, ia, rb, ib, tw_ref, N, sign, scale=None):
    """Split-input butterfly: the transform axis arrives as TWO halves
    (rows 0..N/2 in a, N/2..N in b).  The first stage gathers its slabs
    directly from the two inputs — no materialized input concat (the
    extra full-state copy that made the naive pair kernels ~30% slower
    than the 1-input kernels on hardware)."""
    plan = _stage_plan(N)
    r0 = plan[0]
    Lq = N // r0
    h = N // 2
    assert Lq <= h and h % Lq == 0
    ra, ia = ra[:, None], ia[:, None]
    rb, ib = rb[:, None], ib[:, None]

    def slab(x, y, j):
        s = j * Lq
        return x[s:s + Lq] if s + Lq <= h else y[s - h:s - h + Lq]

    qr = [slab(ra, rb, j) for j in range(r0)]
    qi = [slab(ia, ib, j) for j in range(r0)]
    xr, xi = _stage_apply(qr, qi, r0, N, 0, tw_ref, sign)
    off = (r0 - 1) * Lq
    L = Lq
    for r in plan[1:]:
        Lq = L // r
        qr = [xr[j * Lq:(j + 1) * Lq] for j in range(r)]
        qi = [xi[j * Lq:(j + 1) * Lq] for j in range(r)]
        xr, xi = _stage_apply(qr, qi, r, L, off, tw_ref, sign)
        off += (r - 1) * Lq
        L = Lq
    return _finish(xr, xi, scale)


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


def _kern_mid_t(x_ref, tw_ref, o_ref, *, N, Nt, sign, scale):
    """Mid-axis transform + fused spectral truncation: block in
    (2, 8, N, 128) -> out (2, 8, Nt, 128).  The separate slice pass of
    the 3/2-rule dealiasing path collapses into this kernel's HBM
    write (reference semantics: libfft.py:263-284)."""
    xr = jnp.transpose(x_ref[0], (1, 0, 2))
    xi = jnp.transpose(x_ref[1], (1, 0, 2))
    r, i = _butterfly(xr, xi, tw_ref, N, sign, scale)
    o_ref[0] = jnp.transpose(_trunc_rows(r, N, Nt), (1, 0, 2))
    o_ref[1] = jnp.transpose(_trunc_rows(i, N, Nt), (1, 0, 2))


def _kern_mid_pd(x_ref, tw_ref, o_ref, *, N, Nt, sign, scale):
    """Fused spectral zero-padding + mid-axis transform: block in
    (2, 8, Nt, 128) -> out (2, 8, N, 128)
    (reference semantics: libfft.py:286-311)."""
    xr = _pad_rows(jnp.transpose(x_ref[0], (1, 0, 2)), N, Nt)
    xi = _pad_rows(jnp.transpose(x_ref[1], (1, 0, 2)), N, Nt)
    r, i = _butterfly(xr, xi, tw_ref, N, sign, scale)
    o_ref[0] = jnp.transpose(r, (1, 0, 2))
    o_ref[1] = jnp.transpose(i, (1, 0, 2))


def _kern_lead_t(x_ref, tw_ref, o_ref, *, N, Nt, sign, scale):
    """Lead-axis transform + fused truncation: (2, N, 8, 128) ->
    (2, Nt, 8, 128)."""
    r, i = _butterfly(x_ref[0], x_ref[1], tw_ref, N, sign, scale)
    o_ref[0] = _trunc_rows(r, N, Nt)
    o_ref[1] = _trunc_rows(i, N, Nt)


def _kern_lead_pd(x_ref, tw_ref, o_ref, *, N, Nt, sign, scale):
    """Fused zero-padding + lead-axis transform: (2, Nt, 8, 128) ->
    (2, N, 8, 128)."""
    r, i = _butterfly(_pad_rows(x_ref[0], N, Nt),
                      _pad_rows(x_ref[1], N, Nt), tw_ref, N, sign, scale)
    o_ref[0] = r
    o_ref[1] = i


def _kern_mid_w(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Wide-block mid-axis variant: block (2, 8, N, W) with W a multiple
    of 128 — two adjacent lane tiles per HBM chunk (8 KB, measured 652
    vs 602 GB/s copy at 4 KB, scripts/tpu_blockshape_probe.py).  The
    butterfly runs per 128-lane half so the live state stays (N, 8, 128)
    and the VMEM budget is unchanged."""
    W = x_ref.shape[3]
    for c in range(W // _LANE):
        sl = slice(c * _LANE, (c + 1) * _LANE)
        xr = jnp.transpose(x_ref[0, :, :, sl], (1, 0, 2))
        xi = jnp.transpose(x_ref[1, :, :, sl], (1, 0, 2))
        r, i = _butterfly(xr, xi, tw_ref, N, sign, scale)
        o_ref[0, :, :, sl] = jnp.transpose(r, (1, 0, 2))
        o_ref[1, :, :, sl] = jnp.transpose(i, (1, 0, 2))


def _kern_lead_w(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Wide-block lead-axis variant: block (2, N, 8, W), W = k*128; one
    butterfly per 128-lane half (see _kern_mid_w)."""
    W = x_ref.shape[3]
    for c in range(W // _LANE):
        sl = slice(c * _LANE, (c + 1) * _LANE)
        r, i = _butterfly(x_ref[0, :, :, sl], x_ref[1, :, :, sl],
                          tw_ref, N, sign, scale)
        o_ref[0, :, :, sl] = r
        o_ref[1, :, :, sl] = i


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


def _kern_last2(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Last-axis variant: block (2, 8, 128, N); two tile-local moves
    (last-two swap + leading<->sublane) instead of one (1024, N) 2-D
    transpose."""
    xs = []
    for p in range(2):
        x = jnp.swapaxes(x_ref[p], 1, 2)          # (8, N, 128)
        xs.append(jnp.transpose(x, (1, 0, 2)))    # (N, 8, 128)
    r, i = _butterfly(xs[0], xs[1], tw_ref, N, sign, scale)
    o_ref[0] = jnp.swapaxes(jnp.transpose(r, (1, 0, 2)), 1, 2)
    o_ref[1] = jnp.swapaxes(jnp.transpose(i, (1, 0, 2)), 1, 2)


def _kern_lead(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Transform the leading axis: block (2, N, 8, 128) — already the
    native state layout; no in-kernel relayout at all."""
    r, i = _butterfly(x_ref[0], x_ref[1], tw_ref, N, sign, scale)
    o_ref[0] = r
    o_ref[1] = i


def _kern_lead1(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Lead-axis variant 1: block (2, N, Q); in-kernel lane split."""
    Q = x_ref.shape[2]
    xr = x_ref[0].reshape(N, Q // _LANE, _LANE)
    xi = x_ref[1].reshape(N, Q // _LANE, _LANE)
    r, i = _butterfly(xr, xi, tw_ref, N, sign, scale)
    o_ref[0] = r.reshape(N, Q)
    o_ref[1] = i.reshape(N, Q)




# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _cdiv(a, b):
    return -(-a // b)


def supported_axis(shape, axis, dtype):
    """True if ``fft_axis_p`` has a kernel for this (shape, axis, dtype).

    shape is the complex shape (no planar dim); f32 only (f64 is emulated
    on TPU and stays on the einsum engine).  Lane extents need not divide
    the 128-lane block: ragged edge blocks are masked by the pipeline
    (probed legal + bit-correct on hardware) — this is what lets the
    r2c half-spectrum's N//2+1 extents stay on the kernel path.
    """
    if np.dtype(dtype) != np.float32:
        return False
    nd = len(shape)
    axis = axis % nd
    N = shape[axis]
    if not _supported_len(N) or N > _MAX_N_AXIS:
        return False
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    if post == 1:
        return pre % (_SUB * _LANE) == 0
    if pre == 1:
        return post >= _LANE
    return pre % _SUB == 0 and post >= _LANE


@functools.partial(jax.jit,
                   static_argnames=('axis', 'sign', 'interpret', 'scale',
                                    'oop'))
def _dispatch(p, axis, sign, interpret, scale, oop=None):
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
    tw_spec = _bspec((2, tw_small.shape[1], _SUB, _LANE),
                           lambda *g: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    if post == 1:
        if _last_variant(N) == '2':
            x = p.reshape(2, pre // _LANE, _LANE, N)
            out = _pcall(
                functools.partial(_kern_last2, N=N, sign=sign, scale=scale),
                x, tw, (2, _SUB, _LANE, N), lambda i: (0, i, 0, 0),
                tw_spec, (pre // (_SUB * _LANE),), N, interpret, oop=oop)
            return out.reshape(p.shape)
        x = p.reshape(2, pre, N)
        R = _SUB * _LANE
        out = _pcall(
            functools.partial(_kern_last, N=N, sign=sign, scale=scale),
            x, tw, (2, R, N), lambda i: (0, i, 0),
            tw_spec, (pre // R,), N, interpret, oop=oop)
    elif pre == 1:
        if (N > _MAX_N and p.ndim == 4 and p.shape[3] % _LANE == 0
                and p.shape[2] % _SUB == 0):
            if _wide_ok(p.shape[3]):
                out = _pcall(
                    functools.partial(_kern_lead_w, N=N, sign=sign,
                                      scale=scale),
                    p, tw, (2, N, _SUB, _WIDE_W),
                    lambda i, j: (0, 0, i, j),
                    tw_spec, (p.shape[2] // _SUB, p.shape[3] // _WIDE_W),
                    N, interpret, oop=oop)
                return out
            # long-N: (2, N, 8, 128) blocks over the NATIVE 4-D shape
            # (2-D grid) instead of reshaping to (2, N, post//128, 128)
            # outside — that reshape splits the lane dim, which under TPU
            # (8,128) tiling is a physical relayout that XLA materializes
            # as a full extra volume (8 GB at 1024^3: the difference
            # between fitting the 15.75 GB HBM and OOM).
            out = _pcall(
                functools.partial(_kern_lead, N=N, sign=sign, scale=scale),
                p, tw, (2, N, _SUB, _LANE), lambda i, j: (0, 0, i, j),
                tw_spec, (p.shape[2] // _SUB, p.shape[3] // _LANE),
                N, interpret, oop=oop)
            return out
        if post % _LANE:
            # ragged lane extent: variant-1 blocks with a masked edge
            x = p.reshape(2, N, post)
            Q = _SUB * _LANE
            out = _pcall(
                functools.partial(_kern_lead1, N=N, sign=sign, scale=scale),
                x, tw, (2, N, Q), lambda i: (0, 0, i),
                tw_spec, (_cdiv(post, Q),), N, interpret, oop=oop)
            return out.reshape(p.shape)
        if _LEAD_VARIANT == '3' and post % (2 * _SUB * _LANE) == 0:
            S = 2 * _SUB                     # 16 sublanes: 8 KiB HBM chunks
            tw = jnp.broadcast_to(tw_small[:, :, None, None],
                                  (2, tw_small.shape[1], S, _LANE))
            tw_spec = _bspec((2, tw_small.shape[1], S, _LANE),
                                   lambda *g: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            x = p.reshape(2, N, post // _LANE, _LANE)
            # N <= 256: 64 MB covers the doubled (S=16) block; longer N
            # needs _cparams' per-N budget (96/120 MB) or compile fails
            out = _pcall(
                functools.partial(_kern_lead, N=N, sign=sign, scale=scale),
                x, tw, (2, N, S, _LANE), lambda i: (0, 0, i, 0),
                tw_spec, (post // (S * _LANE),), N, interpret, oop=oop,
                mb=64 if N <= 256 else None)
            return out.reshape(p.shape)
        if _LEAD_VARIANT == '1':
            x = p.reshape(2, N, post)
            Q = _SUB * _LANE
            out = _pcall(
                functools.partial(_kern_lead1, N=N, sign=sign, scale=scale),
                x, tw, (2, N, Q), lambda i: (0, 0, i),
                tw_spec, (_cdiv(post, Q),), N, interpret, oop=oop)
            return out.reshape(p.shape)
        if _wide_ok(post) and (post // _WIDE_W) % _SUB == 0:
            x = p.reshape(2, N, post // _WIDE_W, _WIDE_W)
            out = _pcall(
                functools.partial(_kern_lead_w, N=N, sign=sign,
                                  scale=scale),
                x, tw, (2, N, _SUB, _WIDE_W), lambda i: (0, 0, i, 0),
                tw_spec, (post // (_SUB * _WIDE_W),), N, interpret, oop=oop)
            return out.reshape(p.shape)
        x = p.reshape(2, N, post // _LANE, _LANE)
        out = _pcall(
            functools.partial(_kern_lead, N=N, sign=sign, scale=scale),
            x, tw, (2, N, _SUB, _LANE), lambda i: (0, 0, i, 0),
            tw_spec, (_cdiv(post // _LANE, _SUB),), N, interpret, oop=oop)
    else:
        x = p.reshape(2, pre, N, post)
        if _wide_ok(post):
            out = _pcall(
                functools.partial(_kern_mid_w, N=N, sign=sign,
                                  scale=scale),
                x, tw, (2, _SUB, N, _WIDE_W), lambda i, j: (0, i, 0, j),
                tw_spec, (pre // _SUB, post // _WIDE_W), N, interpret, oop=oop)
            return out.reshape(p.shape)
        out = _pcall(
            functools.partial(_kern_mid, N=N, sign=sign, scale=scale),
            x, tw, (2, _SUB, N, _LANE), lambda i, j: (0, i, 0, j),
            tw_spec, (pre // _SUB, _cdiv(post, _LANE)), N, interpret, oop=oop)
    return out.reshape(p.shape)


def fft_axis_p(p, axis, forward=True, interpret=None, scale=None,
               oop=None):
    """Planar c2c FFT along ``axis`` (complex coords) of (2, ...) data.

    Requires ``supported_axis(p.shape[1:], axis, p.dtype)``.  Unnormalized
    unless ``scale`` is given (applied in-VMEM in the final stage — saves
    the separate normalization HBM pass).  forward=False is the unscaled
    inverse.  2 HBM passes, VPU butterflies.  ``oop`` (tri-state)
    overrides the in-place aliasing policy per call (see ``_alias``):
    a schedule that manages HBM liveness itself passes oop=True for the
    fast out-of-place rate, oop=False to force aliasing.
    """
    nd = p.ndim - 1
    axis = axis % nd
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    sign = -1 if forward else +1
    return _dispatch(p, axis, sign, interpret,
                     None if scale is None else float(scale), oop)


# ---------------------------------------------------------------------------
# fused 3/2-rule dealiasing kernels — truncation/zero-padding folded into
# the transform's own HBM pass
# ---------------------------------------------------------------------------

def fused_tp_enabled():
    """Fused dealiasing kernels dispatch on the chip (and under
    MPI4PY_FFT_TPU_FUSED_TP=force for interpret-mode test coverage);
    'off' restores the separate truncate/pad passes."""
    mode = _os.environ.get('MPI4PY_FFT_TPU_FUSED_TP', 'auto')
    if mode == 'off':
        return False
    return mode == 'force' or jax.default_backend() == 'tpu'


def supported_axis_tp(shape, axis, dtype, trunc=None, pad=None):
    """Gate for :func:`fft_axis_tp`: c2c transform with fused spectral
    truncation (``trunc=Nt``) or fused zero-padding (``pad=Np``) along
    ``axis``.  ``shape`` is the complex input shape.  Lead/mid axis
    positions only (the last axis of the dealiased pipeline is the
    Hermitian r2c side, handled separately)."""
    assert (trunc is None) != (pad is None)
    if np.dtype(dtype) != np.float32:
        return False
    nd = len(shape)
    axis = axis % nd
    N = shape[axis] if trunc is not None else int(pad)
    Nt = int(trunc) if trunc is not None else shape[axis]
    if not (0 < Nt < N) or not _supported_len(N) or N > _MAX_N_AXIS:
        return False
    if axis == nd - 1:
        return False
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64))
    if pre == 1:
        return post >= _LANE
    return pre % _SUB == 0 and post >= _LANE


@functools.partial(jax.jit,
                   static_argnames=('axis', 'sign', 'interpret', 'scale',
                                    'trunc', 'pad'))
def _dispatch_tp(p, axis, sign, interpret, scale, trunc, pad):
    shape = p.shape[1:]
    nd = len(shape)
    Nin = shape[axis]
    N = Nin if trunc is not None else int(pad)        # transform length
    Nout = int(trunc) if trunc is not None else int(pad)
    dtype_str = np.dtype(p.dtype).name
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64))
    tw_small = jnp.asarray(_tw_pack(N, sign, dtype_str))
    tw = jnp.broadcast_to(tw_small[:, :, None, None],
                          (2, tw_small.shape[1], _SUB, _LANE))
    tw_spec = _bspec((2, tw_small.shape[1], _SUB, _LANE),
                     lambda *g: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    kf = dict(N=N, Nt=(int(trunc) if trunc is not None else Nin),
              sign=sign, scale=scale)
    kern_lead = _kern_lead_t if trunc is not None else _kern_lead_pd
    kern_mid = _kern_mid_t if trunc is not None else _kern_mid_pd
    kw = {}
    cp = _cparams(N)
    if cp is not None and not interpret:
        kw['compiler_params'] = cp

    def call(kern, x, bin_, bout, imap, grid, out_shape):
        return pl.pallas_call(
            functools.partial(kern, **kf),
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            grid=grid,
            in_specs=[_bspec(bin_, imap, memory_space=pltpu.VMEM),
                      tw_spec],
            out_specs=_bspec(bout, imap, memory_space=pltpu.VMEM),
            interpret=interpret,
            **kw,
        )(x, tw)

    out_shape = (2,) + shape[:axis] + (Nout,) + shape[axis + 1:]
    if pre == 1:
        if p.ndim == 4 and p.shape[3] % _LANE == 0                 and p.shape[2] % _SUB == 0:
            out = call(kern_lead, p,
                       (2, Nin, _SUB, _LANE), (2, Nout, _SUB, _LANE),
                       lambda i, j: (0, 0, i, j),
                       (p.shape[2] // _SUB, p.shape[3] // _LANE),
                       (2, Nout) + p.shape[2:])
            return out
        x = p.reshape(2, Nin, post)
        Q = _SUB * _LANE
        out = call(functools.partial(_kern_lead1_tp, tp_kern=kern_lead),
                   x, (2, Nin, Q), (2, Nout, Q),
                   lambda i: (0, 0, i), (_cdiv(post, Q),),
                   (2, Nout, post))
        return out.reshape(out_shape)
    x = p.reshape(2, pre, Nin, post)
    out = call(kern_mid, x,
               (2, _SUB, Nin, _LANE), (2, _SUB, Nout, _LANE),
               lambda i, j: (0, i, 0, j),
               (pre // _SUB, _cdiv(post, _LANE)),
               (2, pre, Nout, post))
    return out.reshape(out_shape)


def _kern_lead1_tp(x_ref, tw_ref, o_ref, *, tp_kern, N, Nt, sign, scale):
    """Ragged-lane lead wrapper: (2, Nin, 1024) blocks viewed as
    (2, Nin, 8, 128) for the fused lead kernels."""
    nin, nout = x_ref.shape[1], o_ref.shape[1]

    class _V:
        def __init__(self, ref, n):
            self.ref, self.n = ref, n
            self.shape = (2, n, _SUB, _LANE)

        def __getitem__(self, i):
            return self.ref[i].reshape(self.n, _SUB, _LANE)

        def __setitem__(self, i, v):
            self.ref[i] = v.reshape(self.n, _SUB * _LANE)

    tp_kern(_V(x_ref, nin), tw_ref, _V(o_ref, nout),
            N=N, Nt=Nt, sign=sign, scale=scale)


def fft_axis_tp(p, axis, forward=True, trunc=None, pad=None,
                interpret=None, scale=None):
    """Planar c2c FFT along ``axis`` with the 3/2-rule dealiasing
    boundary fused into the kernel's HBM pass: ``trunc=Nt`` truncates
    the spectrum to Nt inside the kernel write (forward dealiasing),
    ``pad=Np`` zero-pads an Nt-extent spectrum to the Np-point
    transform inside the kernel read (backward dealiasing).  Exactly
    one of trunc/pad must be given.  Out-of-place by construction
    (in/out extents differ).  Reference semantics: libfft.py:263-311.
    """
    assert (trunc is None) != (pad is None)
    nd = p.ndim - 1
    axis = axis % nd
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    sign = -1 if forward else +1
    return _dispatch_tp(p, axis, sign, interpret,
                        None if scale is None else float(scale),
                        None if trunc is None else int(trunc),
                        None if pad is None else int(pad))


# ---------------------------------------------------------------------------
# fused two-axis plane kernel — transforms the LAST TWO axes in ONE
# HBM round-trip (4 passes for a 3-D transform instead of 6)
# ---------------------------------------------------------------------------
#
# Block (2, T, N1, N2) with T*N1 = 1024: stage A transforms the lane
# axis N2 in state (N2, 8, 128) (one full page per row — 100% vreg
# occupancy); stage B transforms N1 via a leading<->sublane transpose in
# state (N1, T, N2).  All moves are from the probed-legal set (2-D
# swaps, 3-D lead<->sublane transposes, lane splits/merges, leading-dim
# reshapes).  The fused multidim plan role of fftw_planxfftn.c's ranks[]
# loop (fftw_planxfftn.c:10-40).
#
# HARDWARE A/B RESULT (scripts/tpu_plane_test.py, v5e): numerically
# correct (rel 1.7e-7) but 2.44 ms vs 0.95 ms for two chained
# single-axis kernels at 256^3 — the extra in-VMEM relayouts plus the
# doubled per-block working set (needs vmem_limit_bytes raised past the
# default) defeat the 2-saved HBM passes.  NOT dispatched by default;
# kept as an explicit entry point for future toolchains where VPU
# relayouts get cheaper.

def _kern_plane(x_ref, tw2_ref, tw1_ref, o_ref, *, N1, N2, T, sign, scale):
    R = T * N1
    xs = []
    for p in range(2):
        x = x_ref[p].reshape(R, N2)
        x = jnp.swapaxes(x, 0, 1)                 # (N2, R) 2-D transpose
        xs.append(x.reshape(N2, R // _LANE, _LANE))
    ar, ai = _butterfly(xs[0], xs[1], tw2_ref, N2, sign)
    bs = []
    for a in (ar, ai):
        b = jnp.swapaxes(a.reshape(N2, R), 0, 1)  # back: rows=(t, n1)
        bs.append(jnp.transpose(b.reshape(T, N1, N2), (1, 0, 2)))
    dr, di = _butterfly(bs[0], bs[1], tw1_ref, N1, sign, scale)
    o_ref[0] = jnp.transpose(dr, (1, 0, 2))
    o_ref[1] = jnp.transpose(di, (1, 0, 2))


def supported_plane(shape, dtype):
    """True if ``fft_plane_p`` can fuse the last two axes of ``shape``
    (complex dims, no planar axis) for this dtype."""
    if np.dtype(dtype) != np.float32 or len(shape) < 2:
        return False
    N1, N2 = shape[-2], shape[-1]
    if not (_is_pow2(N1) and _is_pow2(N2)):
        return False
    if N1 > _MAX_N or N2 > _MAX_N or N2 % _LANE:
        return False
    R = _SUB * _LANE
    if R % N1:
        return False
    T = R // N1
    pre = int(np.prod(shape[:-2], dtype=np.int64))
    return pre % T == 0


@functools.partial(jax.jit,
                   static_argnames=('sign', 'interpret', 'scale'))
def _dispatch_plane(p, sign, interpret, scale):
    shape = p.shape[1:]
    N1, N2 = shape[-2], shape[-1]
    T = (_SUB * _LANE) // N1
    pre = int(np.prod(shape[:-2], dtype=np.int64))
    dtype_str = np.dtype(p.dtype).name

    tw2_small = jnp.asarray(_tw_pack(N2, sign, dtype_str))
    tw2 = jnp.broadcast_to(tw2_small[:, :, None, None],
                           (2, tw2_small.shape[1], _SUB, _LANE))
    tw2_spec = _bspec((2, tw2_small.shape[1], _SUB, _LANE),
                            lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    tw1_small = jnp.asarray(_tw_pack(N1, sign, dtype_str))
    tw1 = jnp.broadcast_to(tw1_small[:, :, None, None],
                           (2, tw1_small.shape[1], T, N2))
    tw1_spec = _bspec((2, tw1_small.shape[1], T, N2),
                            lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    x = p.reshape(2, pre, N1, N2)
    out = pl.pallas_call(
        functools.partial(_kern_plane, N1=N1, N2=N2, T=T, sign=sign,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((2, pre, N1, N2), p.dtype),
        grid=(pre // T,),
        in_specs=[_bspec((2, T, N1, N2), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  tw2_spec, tw1_spec],
        out_specs=_bspec((2, T, N1, N2), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(x, tw2, tw1)
    return out.reshape(p.shape)


def fft_plane_p(p, forward=True, interpret=None, scale=None):
    """Planar c2c FFT over BOTH of the last two axes of (2, ...) data in
    a single fused kernel (2 HBM passes total).  Requires
    ``supported_plane(p.shape[1:], p.dtype)``.  Unnormalized unless
    ``scale`` is given (applied in-VMEM in the final stage)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    sign = -1 if forward else +1
    return _dispatch_plane(p, sign, interpret,
                           None if scale is None else float(scale))


# ---------------------------------------------------------------------------
# LARGE fused two-axis plane kernel — one full (N1, N2) plane per block.
#
# The T-packed plane kernel above (supported_plane) targets small axes
# (N <= 256) and lost its A/B on hardware.  At the north-star size the
# economics looked better: a full (1024, 1024) planar plane is 8 MB —
# ONE block in VMEM — and fusing the last two axes cuts a 3-D transform
# from 3 HBM round-trips to 2.  In-kernel moves are all from the
# probed-legal set: 2-D swapaxes, lane splits/merges.  Blocks are
# same-shaped in/out, so in-place HBM aliasing (required to fit 1024^3)
# still applies.  Role of the fused multidim guru plan: reference
# mpi4py_fft/fftw/fftw_planxfftn.c:10-40 (ranks[] loop).
#
# MEASURED VERDICT (v5e, scripts/tpu_slope_probe.py +
# scripts/tpu_radix_ab.py, round 3): NOT dispatched.  A single-axis
# butterfly pass is at the DMA/compute crossover — per 8 MB block, the
# 10-stage butterfly costs ~27 us and the in-place HBM round-trip ~26 us
# (copy ceiling 602-660 GB/s depending on block shape) — so a fused
# two-axis block pays 2x butterfly + 2 in-VMEM (1024,1024) transposes
# (~70 us total, measured 71.4 ms/pass) against a single 26 us DMA.
# Fusing merges the DMA but SUMS the compute; with compute ~= DMA per
# axis, 2-pass fused (~71+28 ms) loses to 3 single-axis passes
# (~85 ms).  It could only win on a toolchain where the in-kernel
# butterfly runs ~2x faster than HBM DMA; kept as an explicit entry
# point for that future.
# ---------------------------------------------------------------------------

def _kern_plane_large(x_ref, tw2_ref, tw1_ref, o_ref, *, N1, N2, sign,
                      scale):
    xr, xi = x_ref[0, 0], x_ref[1, 0]              # (N1, N2)
    # stage A: transform N2 (state (N2, N1/128, 128))
    ar = jnp.swapaxes(xr, 0, 1).reshape(N2, N1 // _LANE, _LANE)
    ai = jnp.swapaxes(xi, 0, 1).reshape(N2, N1 // _LANE, _LANE)
    br, bi = _butterfly(ar, ai, tw2_ref, N2, sign)
    # stage B: transform N1 (state (N1, N2/128, 128))
    cr = jnp.swapaxes(br.reshape(N2, N1), 0, 1).reshape(
        N1, N2 // _LANE, _LANE)
    ci = jnp.swapaxes(bi.reshape(N2, N1), 0, 1).reshape(
        N1, N2 // _LANE, _LANE)
    dr, di = _butterfly(cr, ci, tw1_ref, N1, sign, scale)
    o_ref[0, 0] = dr.reshape(N1, N2)
    o_ref[1, 0] = di.reshape(N1, N2)


def supported_plane_large(shape, dtype):
    """True if ``fft_plane_large_p`` can fuse the LAST TWO axes of
    ``shape`` (complex dims, no planar axis): f32, both pow2 multiples of
    128, plane small enough that block + twiddles + stage temps fit VMEM."""
    if np.dtype(dtype) != np.float32 or len(shape) < 2:
        return False
    N1, N2 = shape[-2], shape[-1]
    if not (_is_pow2(N1) and _is_pow2(N2)):
        return False
    if N1 % _LANE or N2 % _LANE:
        return False
    return N1 * N2 <= 2 ** 20          # <= 8 MB planar block


def _plane_tw(N, sign, dtype_str, sub):
    """Stage twiddle pages shaped (2, T, sub, 128) for a state whose
    trailing dims are (sub, 128)."""
    small = jnp.asarray(_tw_pack(N, sign, dtype_str))
    T = small.shape[1]
    tw = jnp.broadcast_to(small[:, :, None, None], (2, T, sub, _LANE))
    spec = _bspec((2, T, sub, _LANE), lambda *g: (0, 0, 0, 0),
                  memory_space=pltpu.VMEM)
    return tw, spec


@functools.partial(jax.jit,
                   static_argnames=('sign', 'interpret', 'scale'))
def _dispatch_plane_large(p, sign, interpret, scale):
    shape = p.shape[1:]
    N1, N2 = shape[-2], shape[-1]
    pre = int(np.prod(shape[:-2], dtype=np.int64))
    dtype_str = np.dtype(p.dtype).name
    tw2, tw2_spec = _plane_tw(N2, sign, dtype_str, N1 // _LANE)
    tw1, tw1_spec = _plane_tw(N1, sign, dtype_str, N2 // _LANE)
    x = p.reshape(2, pre, N1, N2)
    # VMEM: in/out blocks (2 x 8 MB, aliased) + ~4 live states + twiddles
    out = pl.pallas_call(
        functools.partial(_kern_plane_large, N1=N1, N2=N2, sign=sign,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(pre,),
        in_specs=[_bspec((2, 1, N1, N2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
                  tw2_spec, tw1_spec],
        out_specs=_bspec((2, 1, N1, N2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        input_output_aliases=_alias(x.size * x.dtype.itemsize)
        if not interpret else {},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(x, tw2, tw1)
    return out.reshape(p.shape)


def fft_plane_large_p(p, forward=True, interpret=None, scale=None):
    """Planar c2c FFT over BOTH of the last two axes of (2, ...) data in a
    single fused full-plane kernel (2 HBM passes for both axes).  Requires
    ``supported_plane_large(p.shape[1:], p.dtype)``.  Unnormalized unless
    ``scale`` is given (applied in-VMEM in the final stage)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    sign = -1 if forward else +1
    return _dispatch_plane_large(p, sign, interpret,
                                 None if scale is None else float(scale))


# ---------------------------------------------------------------------------
# split-axis (2-in / 2-out) c2c kernels — out-of-place passes for
# chip-filling volumes
# ---------------------------------------------------------------------------
#
# In-place aliasing costs ~30% HBM bandwidth (see _INPLACE above), but a
# full out-of-place pass needs input + output volumes live at once —
# 2 x 8.6 GB at 1024^3, over the ~16 GB HBM.  These kernels take the
# transform axis SPLIT across TWO arrays (each carrying N/2 of it) and
# write TWO outputs: with the volume stored as quarters
# (x-half x z-half), every pass of a 3-D transform is out-of-place while
# peak HBM stays at 4 quarters + 2 in flight = 1.5 volumes (12.9 GB at
# 1024^3).  XLA's buffer assignment retires each input quarter as its
# pass completes.  Role: the OOP analogue of FFTW_DESTROY_INPUT plans
# (reference fftw flags, mpi4py_fft/fftw/utilities.pyx:28-37).

def _kern_lead2(xa_ref, xb_ref, tw_ref, oa_ref, ob_ref, *, N, sign,
                scale):
    """Lead-axis split pair: blocks (2, N/2, 8, 128) x2 -> same x2.
    First-stage slabs are gathered straight from the two refs
    (_butterfly2) — no materialized input concat."""
    h = N // 2
    r, i = _butterfly2(xa_ref[0], xa_ref[1], xb_ref[0], xb_ref[1],
                       tw_ref, N, sign, scale)
    oa_ref[0], oa_ref[1] = r[:h], i[:h]
    ob_ref[0], ob_ref[1] = r[h:], i[h:]


def _kern_mid2(xa_ref, xb_ref, tw_ref, oa_ref, ob_ref, *, N, sign,
               scale):
    """Mid-axis split pair: blocks (2, 8, N/2, 128) x2 -> same x2."""
    h = N // 2
    r, i = _butterfly2(
        jnp.transpose(xa_ref[0], (1, 0, 2)),
        jnp.transpose(xa_ref[1], (1, 0, 2)),
        jnp.transpose(xb_ref[0], (1, 0, 2)),
        jnp.transpose(xb_ref[1], (1, 0, 2)),
        tw_ref, N, sign, scale)
    oa_ref[0] = jnp.transpose(r[:h], (1, 0, 2))
    oa_ref[1] = jnp.transpose(i[:h], (1, 0, 2))
    ob_ref[0] = jnp.transpose(r[h:], (1, 0, 2))
    ob_ref[1] = jnp.transpose(i[h:], (1, 0, 2))


def _kern_last2s(xa_ref, xb_ref, tw_ref, oa_ref, ob_ref, *, N, sign,
                 scale):
    """Last-axis split pair: blocks (2, 8, 128, N/2) x2; per-input
    variant-2 tile-local moves, slab-gathered butterfly (no concat)."""
    h = N // 2
    st = []
    for ref in (xa_ref, xb_ref):
        for p in range(2):
            x = jnp.swapaxes(ref[p], 1, 2)            # (8, h, 128)
            st.append(jnp.transpose(x, (1, 0, 2)))    # (h, 8, 128)
    r, i = _butterfly2(st[0], st[1], st[2], st[3], tw_ref, N, sign,
                       scale)
    for p, v in ((0, r), (1, i)):
        oa_ref[p] = jnp.swapaxes(jnp.transpose(v[:h], (1, 0, 2)), 1, 2)
        ob_ref[p] = jnp.swapaxes(jnp.transpose(v[h:], (1, 0, 2)), 1, 2)


# Pair kernels hold each half as its own block, so the FULL length can
# exceed the single-kernel cap: at N = 2048 the working set (2+2 half
# blocks of 8.4 MB + ~17 MB twiddle pack + live stage states) still
# fits the raised VMEM budget — probed on hardware; this is what keeps
# 2048-long axes on ONE fused butterfly pass with natural-order output
# halves (no (Q, R) interleave transpose).
_MAX_N_PAIR = 2048


def supported_axis_split(shape, axis, dtype):
    """Gate for ``fft_axis2_p``: ``shape`` is the complex shape of ONE
    half (the split axis carries N/2)."""
    nd = len(shape)
    axis = axis % nd
    full = list(shape)
    full[axis] *= 2
    N = full[axis]
    if N % 2 or not _supported_len(N) or N > _MAX_N_PAIR:
        return False
    if N <= _MAX_N_AXIS:
        if not supported_axis(tuple(full), axis, dtype):
            return False
    elif np.dtype(dtype) != np.float32:
        # beyond the single-kernel cap only the dtype gate is needed
        # here: the pair-specific geometry checks below subsume
        # supported_axis's pre/post conditions
        return False
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    if axis == 0 and pre == 1:
        return post % _LANE == 0
    if post == 1:
        return (N // 2) % _LANE == 0 and pre % (_SUB * _LANE) == 0
    return pre % _SUB == 0 and post % _LANE == 0


@functools.partial(jax.jit,
                   static_argnames=('axis', 'sign', 'interpret', 'scale',
                                    'alias'))
def _dispatch2(pa, pb_, axis, sign, interpret, scale, alias=False):
    shape = pa.shape[1:]
    nd = len(shape)
    N = 2 * shape[axis]
    dtype_str = np.dtype(pa.dtype).name
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    tw_small = jnp.asarray(_tw_pack(N, sign, dtype_str))
    tw = jnp.broadcast_to(tw_small[:, :, None, None],
                          (2, tw_small.shape[1], _SUB, _LANE))
    tw_spec = _bspec((2, tw_small.shape[1], _SUB, _LANE),
                     lambda *g: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    h = N // 2

    def call(kern, xa, xb, block_in, imap, grid, out_shape, block_out=None,
             imap_out=None):
        kw = {}
        cp = _cparams(N)
        if cp is not None and not interpret:
            kw['compiler_params'] = cp
        spec_in = _bspec(block_in, imap, memory_space=pltpu.VMEM)
        spec_out = _bspec(block_out or block_in, imap_out or imap,
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct(out_shape, xa.dtype),
                       jax.ShapeDtypeStruct(out_shape, xa.dtype)),
            grid=grid,
            in_specs=[spec_in, spec_in, tw_spec],
            out_specs=(spec_out, spec_out),
            input_output_aliases={0: 0, 1: 1}
            if (alias and not interpret) else {},
            interpret=interpret,
            **kw,
        )(xa, xb, tw)

    kf = dict(N=N, sign=sign, scale=scale)
    if post == 1:
        xa = pa.reshape(2, pre // _LANE, _LANE, h)
        xb = pb_.reshape(2, pre // _LANE, _LANE, h)
        oa, ob = call(
            functools.partial(_kern_last2s, **kf), xa, xb,
            (2, _SUB, _LANE, h), lambda i: (0, i, 0, 0),
            (pre // (_SUB * _LANE),), xa.shape)
        return oa.reshape(pa.shape), ob.reshape(pa.shape)
    if pre == 1:
        if (pa.ndim == 4 and pa.shape[3] % _LANE == 0
                and pa.shape[2] % _SUB == 0):
            # native 4-D blocks (2-D grid) — NO reshape.  Flattening
            # the trailing dims and re-splitting at 128 is only a
            # metadata reshape when the minor extent IS 128; for
            # quarter shapes (minor = Z/2 = 512) it breaks the (8,128)
            # tiling and XLA materializes a full-volume relayout on
            # both sides of the kernel (measured: the composed y+x
            # pass-set ran at 107.7 ms vs 17+25.5 for its parts).
            oa, ob = call(
                functools.partial(_kern_lead2, **kf), pa, pb_,
                (2, h, _SUB, _LANE), lambda i, j: (0, 0, i, j),
                (pa.shape[2] // _SUB, pa.shape[3] // _LANE), pa.shape)
            return oa, ob
        xa = pa.reshape(2, h, post // _LANE, _LANE)
        xb = pb_.reshape(2, h, post // _LANE, _LANE)
        oa, ob = call(
            functools.partial(_kern_lead2, **kf), xa, xb,
            (2, h, _SUB, _LANE), lambda i: (0, 0, i, 0),
            (_cdiv(post // _LANE, _SUB),), xa.shape)
        return oa.reshape(pa.shape), ob.reshape(pa.shape)
    xa = pa.reshape(2, pre, h, post)
    xb = pb_.reshape(2, pre, h, post)
    oa, ob = call(
        functools.partial(_kern_mid2, **kf), xa, xb,
        (2, _SUB, h, _LANE), lambda i, j: (0, i, 0, j),
        (pre // _SUB, _cdiv(post, _LANE)), xa.shape)
    return oa.reshape(pa.shape), ob.reshape(pa.shape)


def fft_axis2_p(pa, pb_, axis, forward=True, interpret=None, scale=None,
                alias=False):
    """Planar c2c FFT along ``axis`` where that axis is SPLIT across two
    arrays (``pa`` rows 0..N/2, ``pb_`` rows N/2..N).  Out-of-place by
    default (no input aliasing) — the fast-DMA path for volumes whose
    ping-pong pair exceeds HBM; ``alias=True`` writes each output over
    its input half (FFTW_DESTROY_INPUT-style) for schedules where even
    the extra half-pair does not fit.  Returns the two output halves.
    Requires ``supported_axis_split(pa.shape[1:], axis, pa.dtype)``.
    """
    nd = pa.ndim - 1
    axis = axis % nd
    assert pa.shape == pb_.shape
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    sign = -1 if forward else +1
    return _dispatch2(pa, pb_, axis, sign, interpret,
                      None if scale is None else float(scale), alias)


# -- packed-halves pair dispatch --------------------------------------------
# The split axis lives INSIDE one operand as an adjacent (2, N/2) pair
# of sub-axes (a metadata-only reshape of the full array), so feeding a
# long axis to the pair kernel costs ZERO extra HBM passes — no
# materialized half slices on the way in and no concat on the way out.
# This is what keeps N = 2048 axes at ONE fused kernel pass
# (scripts/tpu_pair_axis_probe.py).

def _kern_lead2q(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Packed lead-axis pair: block (2, 2, N/2, 8, 128)."""
    h = N // 2
    r, i = _butterfly2(x_ref[0, 0], x_ref[1, 0], x_ref[0, 1],
                       x_ref[1, 1], tw_ref, N, sign, scale)
    o_ref[0, 0], o_ref[1, 0] = r[:h], i[:h]
    o_ref[0, 1], o_ref[1, 1] = r[h:], i[h:]


def _kern_mid2q(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Packed mid-axis pair: block (2, 8, 2, N/2, 128)."""
    h = N // 2
    r, i = _butterfly2(
        jnp.transpose(x_ref[0, :, 0], (1, 0, 2)),
        jnp.transpose(x_ref[1, :, 0], (1, 0, 2)),
        jnp.transpose(x_ref[0, :, 1], (1, 0, 2)),
        jnp.transpose(x_ref[1, :, 1], (1, 0, 2)),
        tw_ref, N, sign, scale)
    for p, v in ((0, r), (1, i)):
        o_ref[p] = jnp.stack([jnp.transpose(v[:h], (1, 0, 2)),
                              jnp.transpose(v[h:], (1, 0, 2))], axis=1)


def _kern_last2q(x_ref, tw_ref, o_ref, *, N, sign, scale):
    """Packed last-axis pair: block (2, 8, 128, 2, N/2)."""
    h = N // 2
    st = []
    for j in (0, 1):
        for p in (0, 1):
            x = jnp.swapaxes(x_ref[p, :, :, j], 1, 2)     # (8, h, 128)
            st.append(jnp.transpose(x, (1, 0, 2)))        # (h, 8, 128)
    r, i = _butterfly2(st[0], st[1], st[2], st[3], tw_ref, N, sign,
                       scale)
    for p, v in ((0, r), (1, i)):
        o_ref[p] = jnp.stack(
            [jnp.swapaxes(jnp.transpose(v[:h], (1, 0, 2)), 1, 2),
             jnp.swapaxes(jnp.transpose(v[h:], (1, 0, 2)), 1, 2)],
            axis=2)


@functools.partial(jax.jit,
                   static_argnames=('axis', 'sign', 'interpret', 'scale'))
def _dispatch2q(p, axis, sign, interpret, scale):
    shape = p.shape[1:]
    nd = len(shape)
    N = shape[axis]
    h = N // 2
    dtype_str = np.dtype(p.dtype).name
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    tw_small = jnp.asarray(_tw_pack(N, sign, dtype_str))
    tw = jnp.broadcast_to(tw_small[:, :, None, None],
                          (2, tw_small.shape[1], _SUB, _LANE))
    tw_spec = _bspec((2, tw_small.shape[1], _SUB, _LANE),
                     lambda *g: (0, 0, 0, 0), memory_space=pltpu.VMEM)

    def call(kern, x, block, imap, grid):
        kw = {}
        cp = _cparams(N)
        if cp is not None and not interpret:
            kw['compiler_params'] = cp
        return pl.pallas_call(
            functools.partial(kern, N=N, sign=sign, scale=scale),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=grid,
            in_specs=[_bspec(block, imap, memory_space=pltpu.VMEM),
                      tw_spec],
            out_specs=_bspec(block, imap, memory_space=pltpu.VMEM),
            interpret=interpret,
            **kw,
        )(x, tw)

    if post == 1:
        x = p.reshape(2, pre // _LANE, _LANE, 2, h)
        out = call(_kern_last2q, x, (2, _SUB, _LANE, 2, h),
                   lambda i: (0, i, 0, 0, 0), (pre // (_SUB * _LANE),))
    elif pre == 1:
        x = p.reshape(2, 2, h, post // _LANE, _LANE)
        out = call(_kern_lead2q, x, (2, 2, h, _SUB, _LANE),
                   lambda i: (0, 0, 0, i, 0),
                   (_cdiv(post // _LANE, _SUB),))
    else:
        x = p.reshape(2, pre, 2, h, post)
        out = call(_kern_mid2q, x, (2, _SUB, 2, h, _LANE),
                   lambda i, j: (0, i, 0, 0, j),
                   (pre // _SUB, _cdiv(post, _LANE)))
    return out.reshape(p.shape)


def fft_axis_pair_p(p, axis, forward=True, interpret=None, scale=None):
    """Planar c2c FFT along a LONG axis (N up to ``_MAX_N_PAIR``) as one
    packed pair-kernel pass on a single array — the zero-extra-pass form
    of :func:`fft_axis2_p`.  Requires ``supported_axis_split`` on the
    half shape."""
    nd = p.ndim - 1
    axis = axis % nd
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _dispatch2q(p, axis, -1 if forward else +1, interpret,
                       None if scale is None else float(scale))


# ---------------------------------------------------------------------------
# r2c / c2r kernels — real-typed HBM traffic on the real side
# ---------------------------------------------------------------------------
#
# The r2c stage reads a REAL block (half the planar bytes), runs the c2c
# butterfly with a zero imaginary part, and writes only the Hermitian
# half (rows < N//2+1, optionally zero-padded to ``hext`` so the pencil
# pipeline's shardable-extent padding is free).  The c2r stage reads the
# half-spectrum plus a pre-conjugate-reversed tail (built by one cheap
# XLA rev outside the kernel — Mosaic has no in-kernel `rev` lowering on
# this toolchain), rebuilds the full row set by concatenation in-VMEM,
# and writes only the real part.  All blocks carry a leading
# planar/singleton dim so input and output block RANKS match — Mosaic
# rejects mixed-rank block sets ('failed to legalize func.return';
# probed in scripts/tpu_plane_test.py lineage).
# Reference semantics: fftw r2c/c2r guru plans (fftw_planxfftn.c:41-66).

def _rev_pages(x, n):
    """Leading-axis reversal of ``n`` rows by static page concatenation
    (Mosaic has no `rev`/strided-slice lowering on this toolchain; probed
    legal + bit-correct in scripts/tpu_probe_moves.py)."""
    return jnp.concatenate([x[i:i + 1] for i in range(n - 1, -1, -1)],
                           axis=0)


def _herm_trunc_rows(r, i, trunc):
    """Hermitian spectral truncation to ``trunc`` rows in state form
    (reference truncate_planar hermitian semantics, libfft.py:263-284:
    keep the first Nt rows; for even Nt double the folded Nyquist real
    part and zero its imaginary part)."""
    if trunc % 2 == 0:
        return (jnp.concatenate([r[:trunc - 1],
                                 2.0 * r[trunc - 1:trunc]], axis=0),
                jnp.concatenate([i[:trunc - 1],
                                 jnp.zeros_like(i[:1])], axis=0))
    return r[:trunc], i[:trunc]


def _herm_pad_rows(hr, hi, nh):
    """Hermitian zero-padding from Nt = hr.shape[0] rows to ``nh`` rows
    in state form (reference pad_planar hermitian semantics,
    libfft.py:286-311: halve the even-Nt Nyquist real part, zero its
    imaginary part, zero-fill the tail)."""
    Nt = hr.shape[0]
    if Nt >= nh:
        return hr[:nh], hi[:nh]
    z = jnp.zeros((nh - Nt,) + hr.shape[1:], hr.dtype)
    if Nt % 2 == 0:
        return (jnp.concatenate([hr[:Nt - 1], 0.5 * hr[Nt - 1:Nt], z],
                                axis=0),
                jnp.concatenate([hi[:Nt - 1], jnp.zeros_like(hi[:1]), z],
                                axis=0))
    return (jnp.concatenate([hr, z], axis=0),
            jnp.concatenate([hi, z], axis=0))


def _r2c_rows_full(xr, tw_ref, N, nh, hext, scale, trunc=None):
    """Real rows (N, 8, 128) -> half-spectrum planar rows (2, hext, ...)
    via a FULL N-point c2c with zero imaginary part (fallback path)."""
    r, i = _butterfly(xr, jnp.zeros_like(xr), tw_ref, N, -1, scale)
    r, i = r[:nh], i[:nh]
    if trunc is not None and trunc < nh:
        r, i = _herm_trunc_rows(r, i, trunc)
        nh = trunc
    if hext > nh:
        z = jnp.zeros((hext - nh,) + r.shape[1:], r.dtype)
        r = jnp.concatenate([r, z], axis=0)
        i = jnp.concatenate([i, z], axis=0)
    return r, i


def _r2c_rows(xr, tw_ref, N, nh, hext, scale, packed=True,
              trunc=None):
    """Real rows (N, 8, 128) -> half-spectrum planar rows (2, hext, ...)
    by the PACKED N/2-point method: z[m] = x[2m] + i x[2m+1] is one
    N/2-point c2c (half the butterfly stages and state traffic of the
    full-c2c-with-zero-imag fallback), unpacked in-VMEM with
        E[k] = (Z[k] + conj(Z[-k]))/2,  O[k] = -i/2 (Z[k] - conj(Z[-k])),
        X[k] = E[k] + w_N^k O[k],  k = 0..N/2
    (FFTW's r2c guru path does the same packing,
    reference: fftw/fftw_planxfftn.c:50-56).

    tw_ref layout: [.., :T2] = N/2-point stage twiddles, [.., T2:T2+nh] =
    (cos, sin)(2 pi k / N) unpack rows (see _tw_pack_packed)."""
    N2 = N // 2
    if not packed or N2 < 2:
        return _r2c_rows_full(xr, tw_ref, N, nh, hext, scale, trunc)
    pair = xr.reshape((N2, 2) + xr.shape[1:])
    zr, zi = pair[:, 0], pair[:, 1]              # even / odd rows
    Zr, Zi = _butterfly(zr, zi, tw_ref, N2, -1, None)
    # Z at k = 0..N2 (Z[N2] = Z[0]) and its index-reversal Z[(N2-k)%N2]
    Zr_e = jnp.concatenate([Zr, Zr[:1]], axis=0)
    Zi_e = jnp.concatenate([Zi, Zi[:1]], axis=0)
    Zr_r = jnp.concatenate([Zr[:1], _rev_pages(Zr[1:], N2 - 1), Zr[:1]],
                           axis=0)
    Zi_r = jnp.concatenate([Zi[:1], _rev_pages(Zi[1:], N2 - 1), Zi[:1]],
                           axis=0)
    Er = 0.5 * (Zr_e + Zr_r)
    Ei = 0.5 * (Zi_e - Zi_r)
    Or = 0.5 * (Zi_e + Zi_r)
    Oi = 0.5 * (Zr_r - Zr_e)
    T2 = _tw_len(N2)
    cw = tw_ref[0, T2:T2 + nh]                    # cos(2 pi k / N) pages
    sw = tw_ref[1, T2:T2 + nh]                    # sin(2 pi k / N) pages
    # X = E + w^k O, w^k = cw - i sw
    r = Er + cw * Or + sw * Oi
    i = Ei + cw * Oi - sw * Or
    if scale is not None:
        r = r * scale
        i = i * scale
    if trunc is not None and trunc < nh:
        r, i = _herm_trunc_rows(r, i, trunc)
        nh = trunc
    if hext > nh:
        z = jnp.zeros((hext - nh,) + r.shape[1:], r.dtype)
        r = jnp.concatenate([r, z], axis=0)
        i = jnp.concatenate([i, z], axis=0)
    return r, i


def _kern_mid_r2c(x_ref, tw_ref, o_ref, *, N, nh, hext, scale, packed,
                  trunc=None):
    xr = jnp.transpose(x_ref[0], (1, 0, 2))       # (N, 8, 128)
    r, i = _r2c_rows(xr, tw_ref, N, nh, hext, scale, packed, trunc)
    o_ref[0] = jnp.transpose(r, (1, 0, 2))
    o_ref[1] = jnp.transpose(i, (1, 0, 2))


def _kern_lead_r2c(x_ref, tw_ref, o_ref, *, N, nh, hext, scale, packed,
                  trunc=None):
    r, i = _r2c_rows(x_ref[0], tw_ref, N, nh, hext, scale, packed,
                     trunc)
    o_ref[0] = r
    o_ref[1] = i


def _kern_last_r2c(x_ref, tw_ref, o_ref, *, N, nh, hext, scale, packed,
                   trunc=None):
    R = x_ref.shape[1]
    x = jnp.swapaxes(x_ref[0], 0, 1)              # (N, R)
    xr = x.reshape(N, R // _LANE, _LANE)
    r, i = _r2c_rows(xr, tw_ref, N, nh, hext, scale, packed, trunc)
    o_ref[0] = jnp.swapaxes(r.reshape(hext, R), 0, 1)
    o_ref[1] = jnp.swapaxes(i.reshape(hext, R), 0, 1)


def _c2r_rows(hr, hi, tr, ti, tw_ref, N, scale):
    """Half-spectrum rows (nh, ...) + conj-reversed tail (nt, ...) ->
    real rows (N, ...): X[N-k] = conj(X[k]) already applied to the tail."""
    if tr is not None:
        hr = jnp.concatenate([hr, tr], axis=0)
        hi = jnp.concatenate([hi, ti], axis=0)
    r, _ = _butterfly(hr, hi, tw_ref, N, +1, scale)
    return r


def _c2r_rows_packed(hr, hi, tw_ref, N, scale):
    """Half-spectrum rows (>= N/2+1, ...) -> real rows (N, ...) by the
    PACKED N/2-point inverse: repack the Hermitian spectrum into
        Z[k] = E[k] + i O[k],  E = (X[k]+conj(X[-k]))/2,
        O = conj(w_N^k) (X[k]-conj(X[-k]))/2,   k = 0..N/2-1,
    one N/2-point inverse butterfly, interleave Re/Im as even/odd output
    rows (x2: unnormalized FFTW c2r returns N*x, the packed inverse N/2).
    No conj-reversed tail input needed — the reversal is in-VMEM pages."""
    N2 = N // 2
    nh = N2 + 1
    Xr, Xi = hr[:nh], hi[:nh]
    # conj(X[N2-k]) rows for k = 0..N2-1: reverse rows 1..N2
    Xr_rev = _rev_pages(Xr[1:nh], N2)
    Xi_rev = _rev_pages(Xi[1:nh], N2)
    Xr_h, Xi_h = Xr[:N2], Xi[:N2]
    Er = 0.5 * (Xr_h + Xr_rev)
    Ei = 0.5 * (Xi_h + Xi_rev * -1.0)
    Dr = Xr_h - Xr_rev
    Di = Xi_h + Xi_rev
    T2 = _tw_len(N2)
    cw = tw_ref[0, T2:T2 + N2]
    sw = tw_ref[1, T2:T2 + N2]
    ORe = 0.5 * (cw * Dr - sw * Di)
    OIm = 0.5 * (cw * Di + sw * Dr)
    Zr = Er - OIm
    Zi = Ei + ORe
    sc = 2.0 if scale is None else 2.0 * scale
    zr, zi = _butterfly(Zr, Zi, tw_ref, N2, +1, sc)
    # interleave: out[2m] = zr[m], out[2m+1] = zi[m] (pair-merge reshape,
    # probed legal in scripts/tpu_probe_moves.py lineage)
    out = jnp.stack([zr, zi], axis=1)
    return out.reshape((N,) + zr.shape[1:])


def _kern_mid_c2r(x_ref, t_ref, tw_ref, o_ref, *, N, nh, nt, scale,
                  packed):
    hr = jnp.transpose(x_ref[0], (1, 0, 2))       # (Hin, 8, 128)
    hi = jnp.transpose(x_ref[1], (1, 0, 2))
    if packed:
        # Hin < nh: fused hermitian zero-padding (3/2-rule backward)
        hr, hi = _herm_pad_rows(hr, hi, nh)
        r = _c2r_rows_packed(hr, hi, tw_ref, N, scale)
    else:
        hr, hi = hr[:nh], hi[:nh]
        tr = jnp.transpose(t_ref[0], (1, 0, 2)) if nt else None
        ti = jnp.transpose(t_ref[1], (1, 0, 2)) if nt else None
        r = _c2r_rows(hr, hi, tr, ti, tw_ref, N, scale)
    o_ref[0] = jnp.transpose(r, (1, 0, 2))


def _kern_lead_c2r(x_ref, t_ref, tw_ref, o_ref, *, N, nh, nt, scale,
                   packed):
    if packed:
        hr, hi = _herm_pad_rows(x_ref[0], x_ref[1], nh)
        r = _c2r_rows_packed(hr, hi, tw_ref, N, scale)
    else:
        tr = t_ref[0] if nt else None
        ti = t_ref[1] if nt else None
        r = _c2r_rows(x_ref[0][:nh], x_ref[1][:nh], tr, ti, tw_ref, N,
                      scale)
    o_ref[0] = r


def _kern_last_c2r(x_ref, t_ref, tw_ref, o_ref, *, N, nh, nt, scale,
                   packed):
    R = x_ref.shape[1]
    Hin = x_ref.shape[2]
    hs, ts = [], [None, None]
    for p in range(2):
        h = jnp.swapaxes(x_ref[p], 0, 1)          # (Hin, R)
        hs.append(h.reshape(Hin, R // _LANE, _LANE)[:nh])
        if nt and not packed:
            t = jnp.swapaxes(t_ref[p], 0, 1)      # (nt, R)
            ts[p] = t.reshape(nt, R // _LANE, _LANE)
    if packed:
        hr, hi = _herm_pad_rows(hs[0], hs[1], nh)
        r = _c2r_rows_packed(hr, hi, tw_ref, N, scale)
    else:
        r = _c2r_rows(hs[0], hs[1], ts[0], ts[1], tw_ref, N, scale)
    o_ref[0] = jnp.swapaxes(r.reshape(N, R), 0, 1)


# packed N/2-point r2c/c2r kernels: 'on' (default) halves the butterfly
# work per real transform; 'off' = the full-c2c fallback (A/B'd on chip)
_PACKED_MODE = _os.environ.get('MPI4PY_FFT_TPU_PACKED_R2C', 'on')


def set_packed_mode(mode):
    global _PACKED_MODE
    assert mode in ('on', 'off')
    _PACKED_MODE = mode



def _ckw(N, interpret):
    """compiler_params kwargs for the r2c/c2r dispatches: the long-N
    kernels (incl. the radix-3 768 lengths) exceed the default 16 MB
    scoped-VMEM stack budget — same per-N sizing as the c2c _pcall."""
    cp = _cparams(N)
    return {} if (cp is None or interpret) else {'compiler_params': cp}

@functools.partial(jax.jit,
                   static_argnames=('axis', 'hext', 'interpret', 'scale',
                                    'packed', 'trunc'))
def _dispatch_r2c(x, axis, hext, interpret, scale, packed, trunc=None):
    shape = x.shape
    nd = len(shape)
    N = shape[axis]
    nh = N // 2 + 1
    dtype_str = np.dtype(x.dtype).name
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    packed = packed and N // 2 >= 2
    pack = _tw_pack_packed(N, -1, dtype_str) if packed \
        else _tw_pack(N, -1, dtype_str)
    tw_small = jnp.asarray(pack)
    tw = jnp.broadcast_to(tw_small[:, :, None, None],
                          (2, tw_small.shape[1], _SUB, _LANE))
    tw_spec = _bspec((2, tw_small.shape[1], _SUB, _LANE),
                           lambda *g: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    kw = dict(N=N, nh=nh, hext=hext, scale=scale, packed=packed,
              trunc=trunc)
    if post == 1:
        xg = x.reshape(1, pre, N)
        R = _SUB * _LANE
        out = pl.pallas_call(
            functools.partial(_kern_last_r2c, **kw),
            out_shape=jax.ShapeDtypeStruct((2, pre, hext), x.dtype),
            grid=(pre // R,),
            in_specs=[_bspec((1, R, N), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=_bspec((2, R, hext), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **_ckw(N, interpret),
        )(xg, tw)
        return out.reshape((2,) + shape[:axis] + (hext,))
    if pre == 1:
        xg = x.reshape(1, N, post // _LANE, _LANE)
        out = pl.pallas_call(
            functools.partial(_kern_lead_r2c, **kw),
            out_shape=jax.ShapeDtypeStruct(
                (2, hext, post // _LANE, _LANE), x.dtype),
            grid=(_cdiv(post // _LANE, _SUB),),
            in_specs=[_bspec((1, N, _SUB, _LANE),
                                   lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=_bspec((2, hext, _SUB, _LANE),
                                   lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **_ckw(N, interpret),
        )(xg, tw)
        return out.reshape((2, hext) + shape[axis + 1:])
    xg = x.reshape(1, pre, N, post)
    out = pl.pallas_call(
        functools.partial(_kern_mid_r2c, **kw),
        out_shape=jax.ShapeDtypeStruct((2, pre, hext, post), x.dtype),
        grid=(pre // _SUB, _cdiv(post, _LANE)),
        in_specs=[_bspec((1, _SUB, N, _LANE),
                               lambda i, j: (0, i, 0, j),
                               memory_space=pltpu.VMEM), tw_spec],
        out_specs=_bspec((2, _SUB, hext, _LANE),
                               lambda i, j: (0, i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **_ckw(N, interpret),
    )(xg, tw)
    return out.reshape((2,) + shape[:axis] + (hext,) + shape[axis + 1:])


def rfft_axis_p(x, axis, hext=None, scale=None, interpret=None,
                trunc=None):
    """Real array -> planar Hermitian half-spectrum along ``axis``.

    Output extent is ``hext`` (default N//2+1, or ``trunc`` when given)
    with exact zero rows beyond the spectrum — the pencil pipeline's
    shardable-extent padding comes out of the kernel for free.
    ``trunc`` (< N//2+1) applies the 3/2-rule HERMITIAN truncation
    inside the kernel write (Nyquist fold for even trunc; reference
    libfft.py:263-284).  Requires ``supported_axis`` on the real input
    shape.  Uses the packed N/2-point kernel unless
    MPI4PY_FFT_TPU_PACKED_R2C=off.
    """
    nd = x.ndim
    axis = axis % nd
    N = x.shape[axis]
    nh = N // 2 + 1
    eff = nh if trunc is None else int(trunc)
    if hext is None:
        hext = eff
    assert hext >= eff
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _dispatch_r2c(x, axis, int(hext), interpret,
                         None if scale is None else float(scale),
                         _PACKED_MODE == 'on',
                         None if trunc is None else int(trunc))


@functools.partial(jax.jit,
                   static_argnames=('axis', 'n', 'interpret', 'scale',
                                    'packed'))
def _dispatch_c2r(p, axis, n, interpret, scale, packed):
    shape = p.shape[1:]
    nd = len(shape)
    N = n
    nh = N // 2 + 1
    packed = packed and N // 2 >= 2
    nt = 0 if packed else N - nh      # conj-reversed tail rows
    Hin = shape[axis]
    dtype_str = np.dtype(p.dtype).name
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    pack = _tw_pack_packed(N, +1, dtype_str) if packed \
        else _tw_pack(N, +1, dtype_str)
    tw_small = jnp.asarray(pack)
    tw = jnp.broadcast_to(tw_small[:, :, None, None],
                          (2, tw_small.shape[1], _SUB, _LANE))
    tw_spec = _bspec((2, tw_small.shape[1], _SUB, _LANE),
                           lambda *g: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    # conj-reversed Hermitian tail, built by XLA (no in-kernel rev):
    # tail[j] = conj(X[(N+1)//2 - 1 - j]) over source rows 1..(N+1)//2
    # (fallback path only — the packed kernel reverses pages in-VMEM)
    ax1 = 1 + axis
    if nt:
        sl = [slice(None)] * p.ndim
        sl[ax1] = slice(1, (N + 1) // 2)
        t = jnp.flip(p[tuple(sl)], axis=ax1)
        t = jnp.concatenate([t[:1], -t[1:]], axis=0)  # conj
    else:              # packed / N == 2: dummy 1-row tail, never read
        zshape = list(p.shape)
        zshape[ax1] = 1
        t = jnp.zeros(zshape, p.dtype)
    kw = dict(N=N, nh=nh, nt=nt, scale=scale, packed=packed)
    out_shape = shape[:axis] + (N,) + shape[axis + 1:]
    if post == 1:
        xg = p.reshape(2, pre, Hin)
        tg = t.reshape(2, pre, t.shape[ax1])
        R = _SUB * _LANE
        out = pl.pallas_call(
            functools.partial(_kern_last_c2r, **kw),
            out_shape=jax.ShapeDtypeStruct((1, pre, N), p.dtype),
            grid=(pre // R,),
            in_specs=[_bspec((2, R, Hin), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      _bspec((2, R, tg.shape[2]),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=_bspec((1, R, N), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **_ckw(N, interpret),
        )(xg, tg, tw)
    elif pre == 1:
        xg = p.reshape(2, Hin, post // _LANE, _LANE)
        tg = t.reshape(2, t.shape[ax1], post // _LANE, _LANE)
        out = pl.pallas_call(
            functools.partial(_kern_lead_c2r, **kw),
            out_shape=jax.ShapeDtypeStruct(
                (1, N, post // _LANE, _LANE), p.dtype),
            grid=(_cdiv(post // _LANE, _SUB),),
            in_specs=[_bspec((2, Hin, _SUB, _LANE),
                                   lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
                      _bspec((2, tg.shape[1], _SUB, _LANE),
                                   lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=_bspec((1, N, _SUB, _LANE),
                                   lambda i: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **_ckw(N, interpret),
        )(xg, tg, tw)
    else:
        xg = p.reshape(2, pre, Hin, post)
        tg = t.reshape(2, pre, t.shape[ax1], post)
        out = pl.pallas_call(
            functools.partial(_kern_mid_c2r, **kw),
            out_shape=jax.ShapeDtypeStruct((1, pre, N, post), p.dtype),
            grid=(pre // _SUB, _cdiv(post, _LANE)),
            in_specs=[_bspec((2, _SUB, Hin, _LANE),
                                   lambda i, j: (0, i, 0, j),
                                   memory_space=pltpu.VMEM),
                      _bspec((2, _SUB, tg.shape[2], _LANE),
                                   lambda i, j: (0, i, 0, j),
                                   memory_space=pltpu.VMEM), tw_spec],
            out_specs=_bspec((1, _SUB, N, _LANE),
                                   lambda i, j: (0, i, 0, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            **_ckw(N, interpret),
        )(xg, tg, tw)
    return out.reshape(out_shape)


def _lead_ragged(shape, axis):
    """True when the lead-axis layout would need a ragged lane reshape —
    supported for c2c (variant-1 masked blocks) but not by the r2c/c2r
    kernels, whose lead path uses native (N, S, 128) blocks."""
    nd = len(shape)
    axis = axis % nd
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(shape[axis + 1:], dtype=np.int64)) \
        if axis < nd - 1 else 1
    return pre == 1 and post % _LANE != 0


def supported_r2c(shape, axis, dtype):
    """Gate for ``rfft_axis_p``: shape is the REAL input shape."""
    return supported_axis(shape, axis, dtype) and \
        not _lead_ragged(shape, axis)


def supported_c2r(shape, axis, n, dtype):
    """Gate for ``irfft_axis_p``: shape is the complex (planar-less)
    spectrum shape; ``n`` the real output length.  Spectrum extents
    BELOW n//2+1 are accepted on the packed kernel path — the hermitian
    3/2-rule zero-padding happens inside the kernel read
    (reference pad_planar semantics, libfft.py:286-311)."""
    nd = len(shape)
    axis = axis % nd
    if shape[axis] < n // 2 + 1 and \
            not (_PACKED_MODE == 'on' and n // 2 >= 2
                 and shape[axis] >= 2):
        return False
    full = shape[:axis] + (n,) + shape[axis + 1:]
    return supported_axis(full, axis, dtype) and \
        not _lead_ragged(full, axis)


def irfft_axis_p(p, axis, n, scale=None, interpret=None):
    """Planar Hermitian half-spectrum -> real array of length ``n`` along
    ``axis``.  Input rows beyond n//2+1 (shardable-extent padding) are
    ignored.  Unscaled inverse unless ``scale`` is given (in-VMEM).
    Uses the packed N/2-point kernel unless MPI4PY_FFT_TPU_PACKED_R2C=off.
    """
    nd = p.ndim - 1
    axis = axis % nd
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _dispatch_c2r(p, axis, int(n), interpret,
                         None if scale is None else float(scale),
                         _PACKED_MODE == 'on')
