"""Composition-overhead hunt at 1024^3.

Standalone pair-butterfly calls run 8.7-9.7 ms (990/885 GB/s), the y
pass 16.6 ms — summed forward = ~53 ms.  The composed fft3_q measures
~83 ms.  Variants isolate what composition adds:

  x2q   — x-pass chained on a 2-quarter state (standalone reference)
  x4q   — x-pass chained on the full 4-quarter state (dissect repro)
  x4q-nodonate — same without donation
  yx4q  — y+x sets (dissect2 repro)
  yx4q-barrier — y+x with optimization_barrier between passes
  fwd   — full forward (y+x+z)
  fwd-k2 — full forward measured at k=(1,2) instead of (1,3)

Run:  python scripts/tpu_compose_probe.py [1024]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    # optional second arg: z extent (vary the live-set size without
    # changing the pair kernel's transform length — the memory-pressure
    # discriminator)
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else n
    qshape = (2, n // 2, n, nz // 2)
    gb_vol = 2 * 4 * int(np.prod(qshape)) * 4 / 1e9   # full volume r+w

    def sync(t):
        v = t[0] if isinstance(t, (tuple, list)) else t
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    key = jax.random.PRNGKey(0)

    def mk(nq):
        return jax.jit(lambda k: tuple(
            jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
            for kk in jax.random.split(k, nq)))(key)

    def probe(tag, nq, passes, donate=True, ks=(1, 3), npass=1,
              mkstate=None):
        try:
            ts = {}
            for k in ks:
                def f(*qs, kk=k):
                    for _ in range(kk):
                        qs = passes(qs)
                    return qs
                j = jax.jit(f, donate_argnums=tuple(range(nq))
                            if donate else ())
                st = mk(nq) if mkstate is None else mkstate(key)
                st = j(*st)
                sync(st)
                st = j(*st)
                sync(st)
                t0 = time.perf_counter()
                for _ in range(3):
                    st = j(*st)
                sync(st)
                ts[k] = (time.perf_counter() - t0) / 3
                del st
            per = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
            print(f"  {tag:24s} {per*1e3:8.2f} ms/set "
                  f"({per*1e3/npass:7.2f} ms/pass, "
                  f"{gb_vol*npass/per:5.0f} GB/s r+w)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  {tag:24s} FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    def ypass(qs):
        return tuple(pb.fft_axis_p(q, 1, True) for q in qs)

    def xpass(qs):
        if len(qs) == 2:
            return tuple(pb.fft_axis2_p(qs[0], qs[1], 0, True))
        q00, q01, q10, q11 = qs
        q00, q10 = pb.fft_axis2_p(q00, q10, 0, True)
        q01, q11 = pb.fft_axis2_p(q01, q11, 0, True)
        return (q00, q01, q10, q11)

    def zpass(qs):
        q00, q01, q10, q11 = qs
        q00, q01 = pb.fft_axis2_p(q00, q01, 2, True)
        q10, q11 = pb.fft_axis2_p(q10, q11, 2, True)
        return (q00, q01, q10, q11)

    def barrier(qs):
        return tuple(lax.optimization_barrier(q) for q in qs)

    def yx_seq(qs):
        # strictly localized chains: finish (y,y,pair) of one quarter
        # pair before touching the next — minimizes the in-flight set
        q00, q01, q10, q11 = qs
        a = pb.fft_axis_p(q00, 1, True)
        b = pb.fft_axis_p(q10, 1, True)
        a, b = pb.fft_axis2_p(a, b, 0, True)
        q01, q11, a, b = lax.optimization_barrier((q01, q11, a, b))
        c = pb.fft_axis_p(q01, 1, True)
        d = pb.fft_axis_p(q11, 1, True)
        c, d = pb.fft_axis2_p(c, d, 0, True)
        return (a, c, b, d)

    # -- eighths schedule: split x, y and z 2-way; every pass is an
    # out-of-place pair over 1.075 GB pieces, keeping the live set at
    # 8 pieces + 2 in flight = 10.75 GB — below the measured ~12 GB
    # cliff where pair passes drop to ~620 GB/s
    eshape = (2, n // 2, n // 2, nz // 2)

    def mk8(key):
        return tuple(
            jax.random.uniform(kk, eshape, jnp.float32, -0.5, 0.5)
            for kk in jax.random.split(key, 8))

    def fwd8(es):
        # pieces indexed e[i][j][k] -> flat 4*i + 2*j + k
        es = list(es)
        for i in (0, 1):
            for k in (0, 1):        # y pass: pair over j
                a, b = es[4 * i + k], es[4 * i + 2 + k]
                a, b = pb.fft_axis2_p(a, b, 1, True)
                es[4 * i + k], es[4 * i + 2 + k] = a, b
        for j in (0, 1):
            for k in (0, 1):        # x pass: pair over i
                a, b = es[2 * j + k], es[4 + 2 * j + k]
                a, b = pb.fft_axis2_p(a, b, 0, True)
                es[2 * j + k], es[4 + 2 * j + k] = a, b
        for i in (0, 1):
            for j in (0, 1):        # z pass: pair over k
                a, b = es[4 * i + 2 * j], es[4 * i + 2 * j + 1]
                a, b = pb.fft_axis2_p(a, b, 2, True)
                es[4 * i + 2 * j], es[4 * i + 2 * j + 1] = a, b
        return tuple(es)

    only = os.environ.get('PROBE_ONLY', '')
    cases = [
        ('fwd8', 8, fwd8, dict(npass=3, mkstate=mk8)),
        ('yx4q-seq', 4, yx_seq, dict(npass=2)),
        ('x2q', 2, xpass, dict(npass=1)),
        ('x4q', 4, xpass, dict(npass=1)),
        ('x4q-nodonate', 4, xpass, dict(donate=False, npass=1)),
        ('yx4q', 4, lambda qs: xpass(ypass(qs)), dict(npass=2)),
        ('yx4q-barrier', 4,
         lambda qs: xpass(barrier(ypass(qs))), dict(npass=2)),
        ('fwd', 4, lambda qs: zpass(xpass(ypass(qs))), dict(npass=3)),
        ('fwd-k2', 4, lambda qs: zpass(xpass(ypass(qs))),
         dict(ks=(1, 2), npass=3)),
    ]
    print(f"== composition probe at {n}^2x{nz} "
          f"({gb_vol:.1f} GB r+w per pass)", flush=True)
    for tag, nq, passes, kw in cases:
        if only and only != tag:
            continue
        probe(tag, nq, passes, **kw)


if __name__ == '__main__':
    main()
