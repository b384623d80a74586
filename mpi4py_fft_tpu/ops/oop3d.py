"""Quartered out-of-place 3-D c2c transform — the chip-filling schedule.

In-place (input-aliased) butterfly passes run at 579-661 GB/s r+w on
v5e; out-of-place passes run at 836-1019 GB/s (scripts/tpu_vpu_probe.py,
scripts/tpu_blockshape_probe.py).  A full OOP pass needs input + output
volumes live at once — 17.2 GB at 1024^3 planar f32, over the ~16 GB
HBM — so chip-filling volumes were forced onto the slow aliased path.

This module stores the volume as FOUR quarters, split along the first
(x) and last (z) complex axes:

    Q[i][j] = volume[:, i*X/2:(i+1)*X/2, :, j*Z/2:(j+1)*Z/2]

and runs every axis pass out-of-place:

    y pass (mid):  per quarter,  fft_axis_p       (axis fully local)
    x pass (lead): per z-half,   fft_axis2_p pair (x split across i)
    z pass (last): per x-half,   fft_axis2_p pair (z split across j)

Peak HBM = 4 quarters + 2 outputs in flight = 1.5 volumes (12.9 GB at
1024^3); XLA's buffer assignment retires each input quarter when its
pass completes.  The state stays quartered across chained transforms
(forward/backward solver loops) — split/assemble only at the
boundaries.  Role: the OOP analogue of FFTW's DESTROY_INPUT plans
(reference mpi4py_fft/fftw/utilities.pyx:28-37) for volumes where
aliasing is the bandwidth bottleneck.

Measured (v5e, 1024^3 c2c, chained fwd/bwd pairs): 82.6 ms/transform
(1949 GF/s) vs 85.8-86.5 on the in-place full-volume path.  Round-4
re-dissection (profiler + honest long-chain walls): the whole chain is
VPU-COMPUTE-bound — per-kernel device times are 12.8-13.8 ms (pair) /
7.4-7.6 ms (1-in), their sum IS the total, and the earlier "pair
passes cap at ~681 GB/s (4-stream pipeline)" reading was a slope-method
artifact.  ~1949 GF/s is the butterfly compute speed-of-light at f32
on this chip (docs/benchmarks.md).
"""
import numpy as np
import jax.numpy as jnp

from . import pallas_butterfly as pb

__all__ = ['supported_q', 'split_q', 'assemble_q', 'fft3_q',
           'supported_8', 'split_8', 'assemble_8', 'fft3_8']


def supported_q(shape, dtype):
    """True if ``fft3_q`` supports a planar volume of complex shape
    ``shape`` (3-D, no planar dim) for this dtype."""
    if len(shape) != 3 or np.dtype(dtype) != np.float32:
        return False
    X, Y, Z = shape
    if X % 2 or Z % 2:
        return False
    q = (X // 2, Y, Z // 2)
    return (pb.supported_axis(q, 1, dtype)
            and pb.supported_axis_split(q, 0, dtype)
            and pb.supported_axis_split(q, 2, dtype))


def split_q(p):
    """Planar volume (2, X, Y, Z) -> tuple of 4 quarters Q[i][j]."""
    X, Z = p.shape[1], p.shape[3]
    hx, hz = X // 2, Z // 2
    return tuple(p[:, i * hx:(i + 1) * hx, :, j * hz:(j + 1) * hz]
                 for i in (0, 1) for j in (0, 1))


def assemble_q(qs):
    """Inverse of ``split_q``."""
    q00, q01, q10, q11 = qs
    top = jnp.concatenate([q00, q01], axis=3)
    bot = jnp.concatenate([q10, q11], axis=3)
    return jnp.concatenate([top, bot], axis=1)


def fft3_q(qs, forward=True, scale=None, interpret=None):
    """3-D c2c transform of a quartered planar volume; returns the
    transformed quarters.  ``scale`` (if given) is folded into the final
    pass in-VMEM."""
    q00, q01, q10, q11 = qs
    # y pass (mid axis, fully local to each quarter)
    q00 = pb.fft_axis_p(q00, 1, forward, interpret=interpret)
    q01 = pb.fft_axis_p(q01, 1, forward, interpret=interpret)
    q10 = pb.fft_axis_p(q10, 1, forward, interpret=interpret)
    q11 = pb.fft_axis_p(q11, 1, forward, interpret=interpret)
    # x pass (lead axis, split across the i halves)
    q00, q10 = pb.fft_axis2_p(q00, q10, 0, forward, interpret=interpret)
    q01, q11 = pb.fft_axis2_p(q01, q11, 0, forward, interpret=interpret)
    # z pass (last axis, split across the j halves; fold normalization)
    q00, q01 = pb.fft_axis2_p(q00, q01, 2, forward, interpret=interpret,
                              scale=scale)
    q10, q11 = pb.fft_axis2_p(q10, q11, 2, forward, interpret=interpret,
                              scale=scale)
    return (q00, q01, q10, q11)


# ---------------------------------------------------------------------------
# eighths schedule — every pass an out-of-place pair, minimum in-flight
# memory
# ---------------------------------------------------------------------------
#
# Splitting the volume in HALF along ALL THREE axes makes every pass a
# pure out-of-place 2-in/2-out pair (full transform axis rebuilt from
# two pieces in VMEM) with only 2 pieces (2.15 GB at 1024^3) in flight:
# peak HBM = 8 pieces + 2 = 10.75 GB vs the quartered schedule's
# 12.9 GB.  Measured throughput is the SAME as quartered (83.6 vs
# 82.4 ms at 1024^3) — the chain is VPU-compute-bound, not DMA-bound
# (docs/benchmarks.md round-4 dissection) — so this schedule's value is
# the 2.15 GB of extra HBM headroom, not speed.

def supported_8(shape, dtype):
    """True if ``fft3_8`` supports a planar volume of complex shape
    ``shape`` (3-D) for this dtype."""
    if len(shape) != 3 or np.dtype(dtype) != np.float32:
        return False
    X, Y, Z = shape
    if X % 2 or Y % 2 or Z % 2:
        return False
    e = (X // 2, Y // 2, Z // 2)
    return (pb.supported_axis_split(e, 0, dtype)
            and pb.supported_axis_split(e, 1, dtype)
            and pb.supported_axis_split(e, 2, dtype))


def split_8(p):
    """Planar volume (2, X, Y, Z) -> tuple of 8 eighths
    E[i*4 + j*2 + k] = p[:, i*X/2:(i+1)*X/2, j*Y/2:.., k*Z/2:..]."""
    hx, hy, hz = p.shape[1] // 2, p.shape[2] // 2, p.shape[3] // 2
    return tuple(
        p[:, i * hx:(i + 1) * hx, j * hy:(j + 1) * hy,
          k * hz:(k + 1) * hz]
        for i in (0, 1) for j in (0, 1) for k in (0, 1))


def assemble_8(es):
    """Inverse of ``split_8``."""
    rows = []
    for i in (0, 1):
        cols = []
        for j in (0, 1):
            cols.append(jnp.concatenate(
                [es[4 * i + 2 * j], es[4 * i + 2 * j + 1]], axis=3))
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def fft3_8(es, forward=True, scale=None, interpret=None):
    """3-D c2c transform of an eighths-split planar volume; ``scale``
    (if given) folds into the final (z) pass in-VMEM."""
    es = list(es)
    for i in (0, 1):                    # y pass: pair over j
        for k in (0, 1):
            a, b = es[4 * i + k], es[4 * i + 2 + k]
            a, b = pb.fft_axis2_p(a, b, 1, forward, interpret=interpret)
            es[4 * i + k], es[4 * i + 2 + k] = a, b
    for j in (0, 1):                    # x pass: pair over i
        for k in (0, 1):
            a, b = es[2 * j + k], es[4 + 2 * j + k]
            a, b = pb.fft_axis2_p(a, b, 0, forward, interpret=interpret)
            es[2 * j + k], es[4 + 2 * j + k] = a, b
    for i in (0, 1):                    # z pass: pair over k
        for j in (0, 1):
            a, b = es[4 * i + 2 * j], es[4 * i + 2 * j + 1]
            a, b = pb.fft_axis2_p(a, b, 2, forward, interpret=interpret,
                                  scale=scale)
            es[4 * i + 2 * j], es[4 * i + 2 * j + 1] = a, b
    return tuple(es)
