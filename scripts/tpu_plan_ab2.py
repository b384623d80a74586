"""Round-4 stage-plan A/B at N=1024 with the HONEST long-chain method.

The round-3 plan table was measured with the slope method that round 4
showed under-reports chained kernels; re-verify the winner and try
untested orders under long unrolled chains (8 calls/dispatch).  The
chain is VPU-compute-bound, so plan arithmetic is now the direct lever.

Run:  python scripts/tpu_plan_ab2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np

PLANS = ['16,16,4', '16,16,2,2', '16,8,8', '8,8,16', '4,16,16',
         '2,16,32', '32,32', '16,4,16', '8,16,8', '4,4,4,4,4']


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import mpi4py_fft_tpu.ops.pallas_butterfly as pb

    n = 1024
    qshape = (2, n // 2, n, n // 2)
    key = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k: jax.random.uniform(k, qshape, jnp.float32,
                                              -0.5, 0.5))

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0, 0, 0, 0)])))

    ref = None
    for plan in PLANS:
        pb._STAGE_PLAN_ENV = plan
        pb._stage_plan.cache_clear()
        try:
            assert pb._stage_plan(n) == tuple(int(t) for t in
                                              plan.split(','))

            def chain(q):
                for _ in range(8):
                    q = pb.fft_axis_p(q, 1, True)
                return q
            j = jax.jit(chain, donate_argnums=(0,))
            q = mk(key)
            q = j(q); sync(q)
            q = j(q); sync(q)
            t0 = time.perf_counter()
            for _ in range(4):
                q = j(q)
            sync(q)
            per = (time.perf_counter() - t0) / 32
            note = ''
            if ref is None:
                ref = per
            else:
                note = f" ({(per / ref - 1) * 100:+.1f}% vs {PLANS[0]})"
            print(f"  plan {plan:12s} {per*1e3:7.3f} ms/call{note}",
                  flush=True)
            del q
        except Exception as e:                        # noqa: BLE001
            print(f"  plan {plan:12s} FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
        finally:
            pb._STAGE_PLAN_ENV = ''
            pb._stage_plan.cache_clear()


if __name__ == '__main__':
    main()
