"""Per-pass dissection of the quartered OOP schedule at 1024^3.

The composed fft3_q measured 135.6 ms/transform vs a 64 ms projection
from half-volume OOP passes — this isolates which pass type eats it:
chained y-only (4x 1-in mid), x-only (2x lead pair), z-only (2x last
pair) passes on steady quartered state.

Run:  python scripts/tpu_oop3d_dissect.py [1024]
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
    gb2 = 4 * 2 * int(np.prod(qshape)) * 4 / 1e9   # full volume r+w / pass

    def sync(qs):
        return float(np.asarray(jax.device_get(qs[0][(0, 0, 0, 0)])))

    key = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k: tuple(
        jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
        for kk in jax.random.split(k, 4)))

    def probe(tag, one_pass):
        try:
            ts = {}
            for k in (1, 3):
                print(f"    [{tag}] k={k} compiling/running...",
                      flush=True)
                def f(*qs, kk=k):
                    for _ in range(kk):
                        qs = one_pass(qs)
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
            b = (ts[3] - ts[1]) / 2
            print(f"  {tag:24s} per-pass {b*1e3:8.3f} ms "
                  f"({gb2 / b:6.0f} GB/s r+w)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  {tag:24s} FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

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

    # 2-in/2-out COPY with the x-pair's exact blocking: isolates the
    # 4-stream pipeline cost from butterfly compute
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_copy2(xa_ref, xb_ref, oa_ref, ob_ref):
        oa_ref[...] = xa_ref[...]
        ob_ref[...] = xb_ref[...]

    def paircopy(qs):
        q00, q01, q10, q11 = qs
        h = n // 2
        outs = []
        for a, b in ((q00, q10), (q01, q11)):
            xa = a.reshape(2, h, (n * h) // 128, 128)
            xb = b.reshape(2, h, (n * h) // 128, 128)
            spec = pb._bspec((2, h, 8, 128), lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM)
            oa, ob = pl.pallas_call(
                k_copy2,
                out_shape=(jax.ShapeDtypeStruct(xa.shape, xa.dtype),) * 2,
                grid=((n * h) // 128 // 8,),
                in_specs=[spec, spec],
                out_specs=(spec, spec),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 2 ** 20),
            )(xa, xb)
            outs.append((oa.reshape(a.shape), ob.reshape(b.shape)))
        return (outs[0][0], outs[1][0], outs[0][1], outs[1][1])

    print(f"== quartered pass dissection at {n}^3", flush=True)
    if os.environ.get('DISSECT_ONLY', '') == 'z':
        probe('z-pass (2x last pair)', zpass)
        return
    probe('pair-copy (x blocking)', paircopy)
    probe('y-pass (4x mid 1-in)', ypass)
    probe('x-pass (2x lead pair)', xpass)
    probe('z-pass (2x last pair)', zpass)


if __name__ == '__main__':
    main()
