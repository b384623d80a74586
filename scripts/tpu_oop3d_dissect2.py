"""Composed-chain dissection: where do the extra ms go in fft3_q?

Measures chained pass-set variants on steady quartered state:
  A: y only            B: y+x           C: y+x+z (= full forward)
and the z-pair alone at k=(1,2) (k=3 breaks the remote compiler).

Run:  python scripts/tpu_oop3d_dissect2.py [1024]
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
    qshape = (2, n // 2, n, n // 2)
    gb2 = 4 * 2 * int(np.prod(qshape)) * 4 / 1e9

    def sync(qs):
        return float(np.asarray(jax.device_get(qs[0][(0, 0, 0, 0)])))

    key = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k: tuple(
        jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
        for kk in jax.random.split(k, 4)))

    def ypass(qs):
        return tuple(pb.fft_axis_p(q, 1, True) for q in qs)

    def xpass(qs):
        q00, q01, q10, q11 = qs
        q00, q10 = pb.fft_axis2_p(q00, q10, 0, True)
        q01, q11 = pb.fft_axis2_p(q01, q11, 0, True)
        return (q00, q01, q10, q11)

    def zpass(qs):
        q00, q01, q10, q11 = qs
        q00, q01 = pb.fft_axis2_p(q00, q01, 2, True)
        q10, q11 = pb.fft_axis2_p(q10, q11, 2, True)
        return (q00, q01, q10, q11)

    def probe(tag, passes, ks=(1, 3)):
        try:
            ts = {}
            for k in ks:
                print(f"    [{tag}] k={k}...", flush=True)
                def f(*qs, kk=k):
                    for _ in range(kk):
                        for p in passes:
                            qs = p(qs)
                    return qs
                j = jax.jit(f, donate_argnums=(0, 1, 2, 3))
                qs = mk(key)
                qs = j(*qs)
                sync(qs)
                for _ in range(2):
                    qs = j(*qs)
                sync(qs)
                t0 = time.perf_counter()
                for _ in range(3):
                    qs = j(*qs)
                sync(qs)
                ts[k] = (time.perf_counter() - t0) / 3
                del qs
            k1, k2 = ks
            b = (ts[k2] - ts[k1]) / (k2 - k1)
            print(f"  {tag:22s} per-set {b*1e3:8.3f} ms "
                  f"({len(passes) * gb2 / b:6.0f} GB/s r+w)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  {tag:22s} FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    print(f"== composed dissection at {n}^3", flush=True)
    probe('z-pair only', [zpass], ks=(1, 2))
    probe('set y', [ypass])
    probe('set y+x', [ypass, xpass])
    probe('set y+x+z (fwd)', [ypass, xpass, zpass], ks=(1, 2))


if __name__ == '__main__':
    main()
