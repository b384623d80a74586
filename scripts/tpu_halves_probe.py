"""Schedule A/B at 1024^3: quartered-OOP vs halves-with-aliased-pair.

The quartered schedule's x/z pair passes cap at ~681 GB/s (4-stream
pipeline), and compose ~12 ms worse than their standalone times.  A
halves schedule replaces them: split the volume along ONE axis, run the
two non-split axis passes as proven-fast 1-in/1-out OOP kernels
(~1030 GB/s) per half, and the split-axis pass as an ALIASED pair
(in-place, ~620-660 GB/s expected).  Projection: 17+17+27 = ~61 ms vs
the measured 82.6 composed quartered.

Measures chained (fwd . bwd)^k at k=1,3 (slope cancels boundary costs),
full production shape (normalize folded into the final pass).

Run:  python scripts/tpu_halves_probe.py [1024]
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
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    scale = 1.0 / float(n) ** 3

    def sync(st):
        v = st[0]
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    key = jax.random.PRNGKey(0)

    def probe(tag, mkstate, step, nbuf):
        """step: state-tuple -> state-tuple, one fwd(norm)+bwd pair."""
        try:
            ts = {}
            for k in (1, 3):
                print(f"    [{tag}] k={k}...", flush=True)

                def f(*st, kk=k):
                    for _ in range(kk):
                        st = step(st)
                    return st
                j = jax.jit(f, donate_argnums=tuple(range(nbuf)))
                st = mkstate(key)
                st = j(*st)
                sync(st)
                for _ in range(2):
                    st = j(*st)
                sync(st)
                t0 = time.perf_counter()
                for _ in range(3):
                    st = j(*st)
                sync(st)
                ts[k] = (time.perf_counter() - t0) / 3
                del st
            per_tf = (ts[3] - ts[1]) / 2 / 2   # /2 sets, /2 fwd+bwd
            gf = 5 * n**3 * np.log2(float(n)**3) / per_tf / 1e9
            print(f"  {tag:32s} {per_tf*1e3:8.2f} ms/transform "
                  f"({gf:6.0f} GF/s)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  {tag:32s} FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # -- current quartered schedule (reference point) ----------------------
    from mpi4py_fft_tpu.ops import oop3d

    def mk_q(key):
        qshape = (2, n // 2, n, n // 2)
        return tuple(jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
                     for kk in jax.random.split(key, 4))

    def step_q(qs):
        qs = oop3d.fft3_q(qs, True, scale=scale)
        return oop3d.fft3_q(qs, False)

    # -- halves split on x: y,z OOP 1-in; x aliased pair -------------------
    def mk_hx(key):
        hshape = (2, n // 2, n, n)
        return tuple(jax.random.uniform(kk, hshape, jnp.float32, -0.5, 0.5)
                     for kk in jax.random.split(key, 2))

    def fft3_hx(st, fwd, sc):
        a, b = st
        a = pb.fft_axis_p(a, 1, fwd, oop=True)
        b = pb.fft_axis_p(b, 1, fwd, oop=True)
        a = pb.fft_axis_p(a, 2, fwd, oop=True)
        b = pb.fft_axis_p(b, 2, fwd, oop=True)
        a, b = pb.fft_axis2_p(a, b, 0, fwd, scale=sc, alias=True)
        return (a, b)

    def step_hx(st):
        return fft3_hx(fft3_hx(st, True, scale), False, None)

    # -- halves split on z: x,y OOP 1-in; z aliased pair -------------------
    def mk_hz(key):
        hshape = (2, n, n, n // 2)
        return tuple(jax.random.uniform(kk, hshape, jnp.float32, -0.5, 0.5)
                     for kk in jax.random.split(key, 2))

    def fft3_hz(st, fwd, sc):
        a, b = st
        a = pb.fft_axis_p(a, 1, fwd, oop=True)
        b = pb.fft_axis_p(b, 1, fwd, oop=True)
        a = pb.fft_axis_p(a, 0, fwd, oop=True)
        b = pb.fft_axis_p(b, 0, fwd, oop=True)
        a, b = pb.fft_axis2_p(a, b, 2, fwd, scale=sc, alias=True)
        return (a, b)

    def step_hz(st):
        return fft3_hz(fft3_hz(st, True, scale), False, None)

    # -- quartered but with ALIASED pairs (isolates aliased-pair rate) ----
    def step_qa(qs):
        def fft3(qs, fwd, sc):
            q00, q01, q10, q11 = qs
            q00 = pb.fft_axis_p(q00, 1, fwd)
            q01 = pb.fft_axis_p(q01, 1, fwd)
            q10 = pb.fft_axis_p(q10, 1, fwd)
            q11 = pb.fft_axis_p(q11, 1, fwd)
            q00, q10 = pb.fft_axis2_p(q00, q10, 0, fwd, alias=True)
            q01, q11 = pb.fft_axis2_p(q01, q11, 0, fwd, alias=True)
            q00, q01 = pb.fft_axis2_p(q00, q01, 2, fwd, scale=sc,
                                      alias=True)
            q10, q11 = pb.fft_axis2_p(q10, q11, 2, fwd, scale=sc,
                                      alias=True)
            return (q00, q01, q10, q11)
        return fft3(fft3(qs, True, scale), False, None)

    print(f"== schedule A/B at {n}^3 (chained fwd+bwd, slope-timed)",
          flush=True)
    which = os.environ.get('PROBE_ONLY', '')
    if not which or which == 'q':
        probe('quartered OOP (current)', mk_q, step_q, 4)
    if not which or which == 'hx':
        probe('halves-x (y,z OOP + x pair-alias)', mk_hx, step_hx, 2)
    if not which or which == 'hz':
        probe('halves-z (y,x OOP + z pair-alias)', mk_hz, step_hz, 2)
    if not which or which == 'qa':
        probe('quartered all-aliased pairs', mk_q, step_qa, 4)


if __name__ == '__main__':
    main()
