"""Matmul-based mixed-radix FFT — the MXU-native transform engine.

This replaces FFTW's butterfly codelets (reference:
mpi4py_fft/fftw/fftw_planxfftn.c and the FFTW library behind it) with the
transform formulation that fits TPU hardware: a Cooley-Tukey decomposition
whose butterflies are *batched small matrix multiplications* running on the
128x128 MXU systolic array, with twiddle application fused by XLA into the
surrounding elementwise stream.

Representation — planar complex:
    TPU toolchains have poor-to-no complex-dtype support (the target
    platform here rejects complex64 outright), and even where supported,
    complex ops lower to implicit real decompositions.  The engine therefore
    computes in *planar* form: a complex array of shape S is a real array of
    shape (2,) + S (index 0 = real, 1 = imaginary part; leading position so
    the TPU (sublane, lane) tiling of the trailing dims is undisturbed).
    Every stage is explicit real arithmetic:
        (xr + i xi)(Wr + i Wi) -> (xr Wr - xi Wi) + i (xr Wi + xi Wr)
    i.e. 4 real MXU matmuls per radix stage.  Complex-dtype wrappers
    (fft1d/fftn/rfftn/irfftn) convert at the boundary for platforms that
    allow complex dtypes (CPU tests, serial API).

Algorithm (per 1-D transform of length N, applied along the last axis):

* N is factorized into radices <= _BASE_RADIX (default 32); each stage
  contracts a (radix x radix) DFT matrix against the reshaped input — for
  N = 1024 that is two batched (32x32) stages + one twiddle;
* prime factors > _BASE_RADIX use Bluestein's chirp-z algorithm (two
  power-of-two transforms of length >= 2N-1) — the equivalent of FFTW's
  generic/Rader plans;
* all twiddle/DFT constants are built in float64 numpy (cached) and
  embedded as XLA constants.

Everything is pure and jittable with static shapes.
"""
import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

_BASE_RADIX = 32

# Matmul precision for the radix stages.  On TPU: 'highest' = 6-pass bf16
# (~f32-exact), 'high' = 3-pass (~1e-6 rel err, 2x faster), 'default' =
# 1-pass bf16 (too lossy for spectral work).  CPU ignores this (always
# full precision).  f64 always uses HIGHEST.
import os as _os
from jax import lax as _lax
_PRECISION = {
    'highest': _lax.Precision.HIGHEST,
    'high': _lax.Precision.HIGH,
    'default': _lax.Precision.DEFAULT,
}[_os.environ.get('MPI4PY_FFT_TPU_PRECISION', 'highest')]


def set_precision(name):
    """Select f32 matmul precision: 'highest' | 'high' | 'default'."""
    global _PRECISION
    _PRECISION = {'highest': _lax.Precision.HIGHEST,
                  'high': _lax.Precision.HIGH,
                  'default': _lax.Precision.DEFAULT}[name]


_F64_TPU_WARNED = [False]


def _prec(dtype):
    if np.dtype(dtype).itemsize == 8:
        # honest-f64 gate: TPUs have no native f64 MXU path, so x64
        # einsum precision is toolchain-dependent.  Measured on the
        # current XLA:TPU toolchain it delivers genuine f64 (rel err
        # 1.1e-14 at 64^3, scripts/tpu_f64_probe.py -> docs/
        # precision.md); earlier toolchains lowered it to multi-pass
        # bf16 at ~f32 accuracy.  The warning stays because precision
        # is not contractual here — run the probe on your toolchain;
        # reference-grade f64 at speed remains the cpu backend.
        import jax
        if not _F64_TPU_WARNED[0] and jax.default_backend() == 'tpu':
            _F64_TPU_WARNED[0] = True
            import warnings
            warnings.warn(
                "f64 transforms on TPU use the (slow) x64 einsum "
                "engine; precision is toolchain-dependent — measured "
                "1.1e-14 here, but verify with scripts/tpu_f64_probe.py "
                "(docs/precision.md); for reference-grade f64 at speed "
                "use the cpu backend", stacklevel=3)
        return _lax.Precision.HIGHEST
    return _PRECISION


# Pallas fused-kernel dispatch: 'auto' uses the fused VMEM kernel on a
# single TPU chip (GSPMD cannot partition a pallas_call, so sharded
# multi-chip pipelines stay on the einsum engine until the shard_map path
# lands); 'on'/'off' force it.
_PALLAS_MODE = _os.environ.get('MPI4PY_FFT_TPU_PALLAS', 'auto')


def set_pallas_mode(mode):
    global _PALLAS_MODE
    assert mode in ('auto', 'on', 'off')
    _PALLAS_MODE = mode


# local (per-shard) dispatch: inside a shard_map body the global
# device_count gate is wrong — each program instance computes on its OWN
# shard and the Pallas kernels apply whenever the *local* shapes are
# supported.  The executors (parallel/mpifft.py, parallel/planar.py) set
# this flag while tracing their per-shard programs; the decision is baked
# into the jaxpr at trace time.  This is what gives the full-featured
# PFFT the multi-chip Pallas path (GSPMD cannot partition a pallas_call;
# reference has a single production path regardless of rank count,
# mpi4py_fft/mpifft.py:308-338).
import contextlib as _contextlib

_LOCAL_DISPATCH = [False]


@_contextlib.contextmanager
def local_dispatch():
    """While active, kernel-dispatch gates ignore the global device count
    (for tracing per-shard programs under shard_map)."""
    old = _LOCAL_DISPATCH[0]
    _LOCAL_DISPATCH[0] = True
    try:
        yield
    finally:
        _LOCAL_DISPATCH[0] = old


def _single_or_local():
    import jax
    return jax.default_backend() == 'tpu' and \
        (_LOCAL_DISPATCH[0] or jax.device_count() == 1)


def _use_pallas(N, dtype=None):
    if _PALLAS_MODE == 'off':
        return False
    if dtype is not None and np.dtype(dtype) != np.float32:
        return False                # the fused kernel is f32-only
    from . import pallas_fft
    if not pallas_fft.supported_length(N):
        return False
    if _PALLAS_MODE == 'on':
        return True
    return _single_or_local()


# Stockham butterfly kernel dispatch (ops/pallas_butterfly.py): the
# preferred single-chip path — 2 HBM passes and 5NlogN VPU flops per axis
# at full f32 precision.  'auto' enables it on a single TPU device for
# supported (pow2) axes; the einsum engine remains the fallback and the
# multi-device (GSPMD) path.
_BFLY_MODE = _os.environ.get('MPI4PY_FFT_TPU_BUTTERFLY', 'auto')


def set_butterfly_mode(mode):
    global _BFLY_MODE
    assert mode in ('auto', 'on', 'off')
    _BFLY_MODE = mode


def _use_butterfly(shape, axis, dtype, r2c=False):
    if _BFLY_MODE == 'off':
        return False
    from . import pallas_butterfly as pb
    sup = pb.supported_r2c if r2c else pb.supported_axis
    if not sup(shape, axis, dtype):
        return False
    if _BFLY_MODE == 'on':
        return True
    return _single_or_local()


def _use_butterfly_pair(shape, axis, dtype):
    """Axes past the single-kernel cap (N = 2048) run as ONE fused
    pair-kernel pass over two half blocks (natural-order output halves:
    no combine stage, no twiddle pass, no (Q, R) interleave transpose —
    the round-4 four-step's overhead passes all disappear)."""
    if _BFLY_MODE == 'off' or np.dtype(dtype) != np.float32:
        return False
    from . import pallas_butterfly as pb
    nd = len(shape)
    axis = axis % nd
    N = shape[axis]
    if N <= pb._MAX_N_AXIS or N % 2:
        return False
    half = list(shape)
    half[axis] = N // 2
    if not pb.supported_axis_split(tuple(half), axis, dtype):
        return False
    if _BFLY_MODE == 'on':
        return True
    return _single_or_local()


def _butterfly_pair(p, axis, forward, scale):
    # slice-halves + concat form.  Measured FASTER than the packed
    # single-operand variant (pb.fft_axis_pair_p: 21.6 vs 20.1 ms on
    # the (2048, 512, 256) lead pass) — XLA aliases the contiguous
    # half-slices and the adjacent output buffers, so the apparent
    # slice/concat passes are already free, while the packed form's 5-D
    # blocks pipeline worse in Mosaic (scripts/tpu_pair_axis_probe.py).
    from . import pallas_butterfly as pb
    nd = p.ndim - 1
    ax = 1 + (axis % nd)
    h = p.shape[ax] // 2
    sl = [slice(None)] * p.ndim
    sl[ax] = slice(0, h)
    a = p[tuple(sl)]
    sl[ax] = slice(h, None)
    b = p[tuple(sl)]
    oa, ob = pb.fft_axis2_p(a, b, axis, forward, scale=scale)
    return jnp.concatenate([oa, ob], axis=ax)


def _butterfly_large_split(shape, axis, dtype):
    """For axes too long for the fused kernel (N > pb._MAX_N, pow2),
    return (R, Q, dit) for the four-step split N = R*Q — an XLA-fused
    outer DFT-R stage around the Q-point kernel — or None.  DIT
    (kernel first) when there is no leading batch, DIF otherwise."""
    from . import pallas_butterfly as pb
    if _BFLY_MODE == 'off' or np.dtype(dtype) != np.float32:
        return None
    nd = len(shape)
    axis = axis % nd
    N = shape[axis]
    if N <= pb._MAX_N or N & (N - 1):
        return None
    # N <= 1024 falls back to a Q = _MAX_N four-step when the direct
    # kernel's geometry gate fails; the long-axis extension (N >= 2048)
    # wraps the longest SINGLE-kernel length so the outer stage stays a
    # tiny R <= 4 — measured FASTER than wrapping the 2048 pair pass
    # (41.7 vs 50.3 ms at (4096, 256, 256); the pair kernel's VMEM
    # pressure halves its throughput, scripts/tpu_pair_axis_probe.py).
    # A supported N = 2048 axis never reaches here (the direct pair
    # path in fft1d_p wins).
    qs = [pb._MAX_N] if N <= pb._MAX_N_AXIS else [pb._MAX_N_AXIS]
    pre = int(np.prod(shape[:axis], dtype=np.int64)) if axis else 1
    for Q in qs:
        R = N // Q
        if not 2 <= R <= 4:
            continue
        if pre == 1:
            sub = shape[:axis] + (Q, R) + shape[axis + 1:]
            ok = pb.supported_axis(sub, axis, dtype)
            dit = True
        else:
            sub = shape[:axis] + (R, Q) + shape[axis + 1:]
            ok = pb.supported_axis(sub, axis + 1, dtype)
            dit = False
        if ok:
            if _BFLY_MODE != 'on' and not _single_or_local():
                return None
            return (R, Q, dit)
    return None


def _butterfly_large(p, axis, sign, split):
    """Four-step long-axis transform: outer radix-R stage (XLA elementwise
    + one einsum contraction, fused into a single HBM pass) around the
    fused Q-point butterfly kernel, then one interleave transpose.

    DIF (batch present): y[r, n2] = sum_n1 x[n1, n2] wR^(n1 r); twiddle
    wN^(r n2); kernel over n2; X[k2*R + r] -> swap (R, Q), flatten.
    DIT (pre == 1): kernel over n2 of x[n2, n1]; twiddle wN^(n1 k2);
    combine over n1; X[k1*Q + k2] -> swap (Q, R), flatten.
    """
    from . import pallas_butterfly as pb
    R, Q, dit = split
    nd = p.ndim - 1
    ax = 1 + (axis % nd)
    N = p.shape[ax]
    dtype_str = np.dtype(p.dtype).name
    shape = p.shape
    ntrail = p.ndim - ax - 1
    if dit:
        x = p.reshape(shape[:ax] + (Q, R) + shape[ax + 1:])
        # kernel on a MERGED 4-D view when possible: a 5-D operand falls
        # off the lead kernel's native-block path and XLA materializes
        # full-volume lane relayouts on both sides; merging (R, trail…)
        # into (M, last) is a free leading-dim reshape
        merged = None
        if ax == 1 and x.ndim >= 5 and x.shape[-1] % 128 == 0:
            M = int(np.prod(x.shape[2:-1], dtype=np.int64))
            if M % 8 == 0:
                merged = x.shape
                x = x.reshape(2, Q, M, x.shape[-1])
        z = pb.fft_axis_p(x, ax - 1, forward=(sign == -1))   # complex coords
        if merged is not None:
            z = z.reshape(merged)
        tw = _twiddle(R, Q, sign, dtype_str).swapaxes(1, 2)  # (2, Q, R)
        tw = jnp.asarray(tw).reshape(
            (2,) + (1,) * (ax - 1) + (Q, R) + (1,) * ntrail)
        z = _pmul(z, tw)
        if R in (2, 4):
            c = _combine_small(z, R, ax + 1, sign)           # k1 at ax+1
        else:
            c = _pmatstage_mid(
                z, jnp.asarray(_dft_matrix(R, sign, dtype_str)), ax + 1)
        c = jnp.swapaxes(c, ax, ax + 1)                      # (k1, k2)
    else:
        x = p.reshape(shape[:ax] + (R, Q) + shape[ax + 1:])
        if R in (2, 4):
            y = _combine_small(x, R, ax, sign)               # r at ax
        else:
            y = _pmatstage_mid(
                x, jnp.asarray(_dft_matrix(R, sign, dtype_str)), ax)
        tw = jnp.asarray(_twiddle(R, Q, sign, dtype_str)).reshape(
            (2,) + (1,) * (ax - 1) + (R, Q) + (1,) * ntrail)
        y = _pmul(y, tw)
        c = pb.fft_axis_p(y, ax, forward=(sign == -1))       # k2 at ax+1
        c = jnp.swapaxes(c, ax, ax + 1)                      # (k2, r)
    return c.reshape(shape[:ax] + (N,) + shape[ax + 1:])


# ---------------------------------------------------------------------------
# constants (numpy, cached, f64-built)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _factorize(N):
    """Factor N into radices <= _BASE_RADIX (largest first); a leftover
    prime > _BASE_RADIX is returned as a single (Bluestein) factor.

    Balanced radices (e.g. 1024 -> 32*32) measure faster through XLA than
    lane-128-preserving splits (e.g. 8*128) on TPU — XLA's relayout of the
    (B, N1, N2) view beats the degenerate small-K matmuls of a skewed
    split.  The fused Pallas kernel uses its own S*128 decomposition.
    """
    factors = []
    m = N
    for p in range(2, _BASE_RADIX + 1):
        while m % p == 0 and m > _BASE_RADIX:
            factors.append(p)
            m //= p
        if m <= _BASE_RADIX:
            break
    if m > 1:
        factors.append(m)
    factors.sort()
    merged = []
    while factors:
        f = factors.pop()
        while factors and f * factors[0] <= _BASE_RADIX:
            f *= factors.pop(0)
        merged.append(f)
    return tuple(sorted(merged, reverse=True))


@functools.lru_cache(maxsize=None)
def _dft_matrix(N, sign, dtype_str):
    """(2, N, N) planar DFT matrix exp(sign*2j*pi*n*k/N): [0]=cos, [1]=sin."""
    n = np.arange(N)
    ang = sign * 2 * np.pi * np.outer(n, n) / N
    W = np.stack([np.cos(ang), np.sin(ang)])
    return W.astype(np.dtype(dtype_str))


@functools.lru_cache(maxsize=None)
def _twiddle(N1, N2, sign, dtype_str):
    """(2, N1, N2) planar twiddle exp(sign*2j*pi*k1*n2/(N1*N2))."""
    k1 = np.arange(N1)[:, None]
    n2 = np.arange(N2)[None, :]
    ang = sign * 2 * np.pi * k1 * n2 / (N1 * N2)
    W = np.stack([np.cos(ang), np.sin(ang)])
    return W.astype(np.dtype(dtype_str))


@functools.lru_cache(maxsize=None)
def _bluestein_consts(N, sign, dtype_str):
    """Planar chirp arrays for Bluestein: (w[2,N], fft(b)[2,M], M)."""
    M = 1
    while M < 2 * N - 1:
        M *= 2
    n = np.arange(N)
    ang = sign * np.pi * n * n / N
    w = np.stack([np.cos(ang), np.sin(ang)])
    b = np.zeros(M, dtype=np.complex128)
    wc = np.exp(-1j * ang)
    b[:N] = wc
    b[M - N + 1:] = wc[1:][::-1]
    fb = np.fft.fft(b)
    fbp = np.stack([fb.real, fb.imag])
    return (w.astype(np.dtype(dtype_str)), fbp.astype(np.dtype(dtype_str)), M)


# ---------------------------------------------------------------------------
# planar helpers
# ---------------------------------------------------------------------------

def planar(z):
    """Complex array -> planar real array (2,) + z.shape."""
    return jnp.stack([jnp.real(z), jnp.imag(z)])


def unplanar(p, dtype=None):
    """Planar real array -> complex array (drops the leading axis)."""
    z = lax.complex(p[0], p[1])
    return z.astype(dtype) if dtype is not None else z


def _pmul(a, b):
    """Planar elementwise complex multiply; a,b: (2, ...) broadcastable."""
    re = a[0] * b[0] - a[1] * b[1]
    im = a[0] * b[1] + a[1] * b[0]
    return jnp.stack([re, im])


def _wblock(W):
    """Planar W (2, n, k) -> batched block form (2, n, 2k):
    [0] = [Wr | Wi], [1] = [Wi | Wr].

    One planar-batched dot against this computes all four real products of
    a complex contraction while reading each input part exactly once:
        out[0] = [xr Wr | xr Wi],  out[1] = [xi Wi | xi Wr]
        y_re = out[0,:k] - out[1,:k];  y_im = out[0,k:] + out[1,k:]
    (vs. four separate dots that each re-read x from HBM).
    """
    Wr, Wi = W[0], W[1]
    return jnp.stack([jnp.concatenate([Wr, Wi], axis=1),
                      jnp.concatenate([Wi, Wr], axis=1)])


def _pmatstage(p, W):
    """Planar radix stage: p (2, ..., n, t) contracted with planar W
    (2, n, k) over n -> (2, ..., k, t).  One batched MXU einsum."""
    prec = _prec(p.dtype)
    k = W.shape[-1]
    Wb = _wblock(W)                       # (2, n, 2k)
    out = jnp.einsum('p...nt,pnk->p...kt', p, Wb, precision=prec)
    return jnp.stack([out[0, ..., :k, :] - out[1, ..., :k, :],
                      out[0, ..., k:, :] + out[1, ..., k:, :]])


def _pmatmul_last(p, W):
    """Planar contraction of the last axis with planar W (2, N, K).
    One batched MXU dot (see _wblock)."""
    prec = _prec(p.dtype)
    k = W.shape[-1]
    Wb = _wblock(W)                       # (2, N, 2k)
    out = jnp.einsum('p...n,pnk->p...k', p, Wb, precision=prec)
    return jnp.stack([out[0, ..., :k] - out[1, ..., :k],
                      out[0, ..., k:] + out[1, ..., k:]])


# ---------------------------------------------------------------------------
# planar core transform (last axis)
# ---------------------------------------------------------------------------

def _fft_last_p(p, sign):
    """Unnormalized planar DFT along the last axis.

    p: (2, ..., N) real.  sign=-1 forward, +1 inverse (unscaled).
    """
    N = p.shape[-1]
    if N == 1:
        return p
    if _use_pallas(N, p.dtype):
        from . import pallas_fft
        return pallas_fft.fft2stage_p(p, sign)
    dtype_str = np.dtype(p.dtype).name
    factors = _factorize(N)
    if len(factors) == 1:
        f = factors[0]
        if f <= _BASE_RADIX:
            return _pmatmul_last(p, jnp.asarray(_dft_matrix(N, sign, dtype_str)))
        return _bluestein_p(p, sign)
    N1 = factors[0]
    N2 = N // N1
    batch = p.shape[1:-1]
    x = p.reshape((2,) + batch + (N1, N2))      # x[n1, n2], n = n1*N2 + n2
    a = _pmatstage(x, jnp.asarray(_dft_matrix(N1, sign, dtype_str)))
    a = _pmul(a, jnp.asarray(_twiddle(N1, N2, sign, dtype_str)).reshape(
        (2,) + (1,) * len(batch) + (N1, N2)))
    c = _fft_last_p(a, sign)                    # c[k1, k2]
    c = jnp.swapaxes(c, -1, -2)                 # X[k2*N1 + k1]
    return c.reshape((2,) + batch + (N,))


def _bluestein_p(p, sign):
    """Planar chirp-z transform for prime lengths > _BASE_RADIX."""
    N = p.shape[-1]
    dtype_str = np.dtype(p.dtype).name
    w, fb, M = _bluestein_consts(N, sign, dtype_str)
    w = jnp.asarray(w).reshape((2,) + (1,) * (p.ndim - 2) + (N,))
    fb = jnp.asarray(fb).reshape((2,) + (1,) * (p.ndim - 2) + (M,))
    a = jnp.zeros(p.shape[:-1] + (M,), dtype=p.dtype)
    a = a.at[..., :N].set(_pmul(p, w))
    fa = _fft_last_p(a, -1)
    conv = _fft_last_p(_pmul(fa, fb), +1) / M
    return _pmul(conv[..., :N], w)


# Mid-axis strategy: 'moveaxis' transposes the transform axis to the end
# (two full HBM transposes per non-final axis); 'einsum' contracts the
# axis in place — the (N1, N2) split of a middle axis is metadata-only,
# and only the final k1<->k2 swap moves data.
_MID_AXIS = _os.environ.get('MPI4PY_FFT_TPU_MID_AXIS', 'einsum')


def set_mid_axis_strategy(mode):
    global _MID_AXIS
    assert mode in ('moveaxis', 'einsum')
    _MID_AXIS = mode


def _combine_small(z, R, axis, sign):
    """Elementwise DFT-R combine over a length-R planar axis for tiny R
    (2, 4) — the four-step's outer stage without an MXU einsum: XLA
    fuses the adds/twiddle rotations into one HBM pass, where the
    degenerate (n x R) matmul of ``_pmatstage_mid`` costs extra full
    passes.  ``axis`` is in planar coords; complex values are planar
    (plane 0 = re, plane 1 = im)."""
    def at(j):
        sl = [slice(None)] * z.ndim
        sl[axis] = slice(j, j + 1)
        return z[tuple(sl)]

    def cat(parts):
        return jnp.concatenate(parts, axis=axis)

    def neg_i(v):
        # multiply by exp(sign*i*pi/2) = sign*i: (re, im) -> sign*(-im, re)
        return sign * jnp.concatenate([-v[1:2], v[0:1]], axis=0)

    if R == 2:
        a, b = at(0), at(1)
        return cat([a + b, a - b])
    assert R == 4
    z0, z1, z2, z3 = at(0), at(1), at(2), at(3)
    t0, t1 = z0 + z2, z1 + z3
    t2, t3 = z0 - z2, z1 - z3
    u3 = neg_i(t3)
    return cat([t0 + t1, t2 + u3, t0 - t1, t2 - u3])


def _pmatstage_mid(p, W, axis):
    """Planar contraction of p's ``axis`` (in planar coords) with planar
    W (2, n, k), output k at the same position.  One batched MXU einsum
    (see _wblock)."""
    prec = _prec(p.dtype)
    nd = p.ndim
    k = W.shape[-1]
    sub = 'abcdefgh'[:nd - 1]
    lhs = 'p' + sub[:axis - 1] + 'n' + sub[axis - 1:nd - 2]
    out = 'p' + sub[:axis - 1] + 'k' + sub[axis - 1:nd - 2]
    expr = f'{lhs},pnk->{out}'
    Wb = _wblock(W)
    o = jnp.einsum(expr, p, Wb, precision=prec)
    ksl_lo = [slice(None)] * nd
    ksl_hi = [slice(None)] * nd
    ksl_lo[axis] = slice(0, k)
    ksl_hi[axis] = slice(k, 2 * k)
    lo = o[tuple(ksl_lo)]
    hi = o[tuple(ksl_hi)]
    return jnp.stack([lo[0] - lo[1], hi[0] + hi[1]])


def _fft_axis_einsum(p, axis, sign):
    """In-place-axis planar DFT: no moveaxis; recursion splits the axis
    with metadata-only reshapes."""
    nd = p.ndim
    ax = 1 + axis                  # planar coords
    N = p.shape[ax]
    if N == 1:
        return p
    dtype_str = np.dtype(p.dtype).name
    factors = _factorize(N)
    if len(factors) == 1 and factors[0] <= _BASE_RADIX:
        return _pmatstage_mid(p, jnp.asarray(_dft_matrix(N, sign, dtype_str)),
                              ax)
    if len(factors) == 1:
        # Bluestein needs the axis last; fall back to moveaxis
        p2 = jnp.moveaxis(p, ax, -1)
        y = _bluestein_p(p2, sign)
        return jnp.moveaxis(y, -1, ax)
    N1 = factors[0]
    N2 = N // N1
    shape = p.shape
    x = p.reshape(shape[:ax] + (N1, N2) + shape[ax + 1:])   # metadata only
    a = _pmatstage_mid(x, jnp.asarray(_dft_matrix(N1, sign, dtype_str)), ax)
    tw = jnp.asarray(_twiddle(N1, N2, sign, dtype_str))
    tw = tw.reshape((2,) + (1,) * (ax - 1) + (N1, N2)
                    + (1,) * (len(shape) - ax - 1))
    a = _pmul(a, tw)
    # recurse on the N2 sub-axis (complex coordinate axis+1 of ``a``)
    c = _fft_axis_einsum(a, axis + 1, sign)
    # X[k2*N1 + k1]: swap the two split axes, then flatten
    c = jnp.swapaxes(c, ax, ax + 1)
    return c.reshape(shape[:ax] + (N,) + shape[ax + 1:])


def _use_ds(shape, axis, dtype):
    """f64 work routes through the double-single kernel tier on TPU
    (ops/pallas_ds.py) when the shapes ride it — ~80x the x64 einsum
    engine at DS (~4e-15) accuracy; the performance answer to the
    reference's f64-default builds (reference: libfft.py:225,314)."""
    if np.dtype(dtype) != np.float64:
        return False
    from . import pallas_ds as pds
    return pds.ds_wanted() and pds.supported_ds(shape, axis)


def fft1d_p(p, axis, forward=True, scale=None):
    """Planar c2c transform along ``axis`` of the complex array (axis
    counted WITHOUT the leading planar dim).  Unnormalized unless
    ``scale`` is given (fused into the transform output — in-kernel for
    the butterfly path, XLA-fused elementwise otherwise)."""
    sign = -1 if forward else +1
    nd = p.ndim - 1                 # complex rank
    axis = axis % nd
    if _use_ds(p.shape[1:], axis, p.dtype):
        from . import pallas_ds as pds
        q = pds.fft_axis_ds(pds.split_planar_ds(p), axis, forward)
        if scale is not None:
            q = pds.scale_ds(q, scale)
        return pds.join_planar_ds(q)
    if _use_butterfly(p.shape[1:], axis, p.dtype):
        from . import pallas_butterfly as pb
        return pb.fft_axis_p(p, axis, forward, scale=scale)
    if _use_butterfly_pair(p.shape[1:], axis, p.dtype):
        return _butterfly_pair(p, axis, forward, scale)
    split = _butterfly_large_split(p.shape[1:], axis, p.dtype)
    if split is not None:
        y = _butterfly_large(p, axis, sign, split)
    elif axis == nd - 1:
        y = _fft_last_p(p, sign)
    elif _MID_AXIS == 'einsum':
        y = _fft_axis_einsum(p, axis, sign)
    else:
        p = jnp.moveaxis(p, 1 + axis, -1)
        y = jnp.moveaxis(_fft_last_p(p, sign), -1, 1 + axis)
    if scale is not None:
        y = y * np.asarray(scale, dtype=p.dtype)
    return y


def fftn_p(p, axes, forward=True):
    for a in axes:
        p = fft1d_p(p, a, forward)
    return p


def rfftn_p(x, axes, hext=None):
    """Real input -> planar half spectrum; axes[-1] halved to N//2+1
    (or zero-padded rows up to ``hext`` when given)."""
    a_last = axes[-1] % x.ndim
    N = x.shape[a_last]
    if np.dtype(x.dtype) == np.float64:
        from . import pallas_ds as pds
        if pds.ds_wanted() and pds.supported_rfft_ds(x.shape, a_last):
            y = pds.rfft_axis_ds(pds.split_real_ds(x), a_last, hext=hext)
            y = pds.join_planar_ds(y)
            for a in axes[:-1]:
                y = fft1d_p(y, a, forward=True)
            return y
    if _use_butterfly(x.shape, a_last, x.dtype, r2c=True):
        from . import pallas_butterfly as pb
        y = pb.rfft_axis_p(x, a_last, hext=hext)
    else:
        p = jnp.stack([x, jnp.zeros_like(x)])
        y = fft1d_p(p, a_last, forward=True)
        sl = [slice(None)] * y.ndim
        sl[1 + a_last] = slice(0, N // 2 + 1)
        y = y[tuple(sl)]
        if hext is not None and hext > N // 2 + 1:
            pad = [(0, 0)] * y.ndim
            pad[1 + a_last] = (0, hext - (N // 2 + 1))
            y = jnp.pad(y, pad)
    for a in axes[:-1]:
        y = fft1d_p(y, a, forward=True)
    return y


def _use_butterfly_c2r(shape, axis, n, dtype):
    if _BFLY_MODE == 'off':
        return False
    from . import pallas_butterfly as pb
    if not pb.supported_c2r(shape, axis, n, dtype):
        return False
    if _BFLY_MODE == 'on':
        return True
    return _single_or_local()


def irfftn_p(p, axes, last_size, scale=None):
    """Planar half spectrum -> real output of length ``last_size``.
    Input rows beyond N//2+1 along axes[-1] (shardable-extent padding)
    are ignored; ``scale`` is fused into the output."""
    for a in axes[:-1]:
        p = fft1d_p(p, a, forward=False)
    nd = p.ndim - 1
    a_last = axes[-1] % nd
    N = int(last_size)
    if np.dtype(p.dtype) == np.float64:
        from . import pallas_ds as pds
        full = list(p.shape[1:])
        full[a_last] = N
        if pds.ds_wanted() and pds.supported_rfft_ds(tuple(full), a_last):
            y = pds.irfft_axis_ds(pds.split_planar_ds(p), a_last, N,
                                  scale=scale)
            return pds.join_real_ds(y)
    if _use_butterfly_c2r(p.shape[1:], a_last, N, p.dtype):
        from . import pallas_butterfly as pb
        return pb.irfft_axis_p(p, a_last, N, scale=scale)
    nh = N // 2 + 1
    sl = [slice(None)] * p.ndim
    sl[1 + a_last] = slice(0, nh)
    p = p[tuple(sl)]
    H = jnp.moveaxis(p, 1 + a_last, -1)
    # Hermitian extension: X[N-k] = conj(X[k]), k = 1..ceil(N/2)-1
    tail_r = H[0][..., 1:(N + 1) // 2][..., ::-1]
    tail_i = -H[1][..., 1:(N + 1) // 2][..., ::-1]
    full = jnp.stack([jnp.concatenate([H[0], tail_r], axis=-1),
                      jnp.concatenate([H[1], tail_i], axis=-1)])
    y = _fft_last_p(full, +1)[0]    # real part of the inverse
    if scale is not None:
        y = y * np.asarray(scale, dtype=y.dtype)
    return jnp.moveaxis(y, -1, a_last)


# ---------------------------------------------------------------------------
# complex-dtype wrappers (boundary conversion; for complex-capable backends)
# ---------------------------------------------------------------------------

def _real_of(dtype):
    d = np.dtype(dtype)
    return np.dtype('float32') if d.itemsize == 8 or d == np.float32 \
        else np.dtype('float64')


def fft1d(x, axis, forward=True):
    """Unnormalized c2c transform along one axis (complex in/out)."""
    x = jnp.asarray(x)
    if x.dtype.kind != 'c':
        x = x.astype(np.dtype('complex64') if x.dtype.itemsize == 4
                     else np.dtype('complex128'))
    return unplanar(fft1d_p(planar(x), axis, forward), x.dtype)


def fftn(x, axes, forward=True):
    x = jnp.asarray(x)
    if x.dtype.kind != 'c':
        x = x.astype(np.dtype('complex64') if x.dtype.itemsize == 4
                     else np.dtype('complex128'))
    return unplanar(fftn_p(planar(x), axes, forward), x.dtype)


def rfftn(x, axes):
    cdtype = (np.dtype('complex64') if np.dtype(x.dtype).itemsize == 4
              else np.dtype('complex128'))
    return unplanar(rfftn_p(jnp.asarray(x), axes), cdtype)


def irfftn(x, axes, last_size):
    return irfftn_p(planar(jnp.asarray(x)), axes, last_size)
