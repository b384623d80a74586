"""Pair-butterfly rate probe: the pair COPY at production blocking runs
~1030 GB/s (scripts/tpu_pair_blocking_probe.py) but the pair BUTTERFLY
pass composes at ~681 GB/s — the loss is in-kernel DMA/compute overlap,
not stream count.  Variants: VMEM budget sweep, alias on/off, x vs z
axis, and serial-grid semantics.

Run:  python scripts/tpu_pair_butterfly_probe.py [1024]
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
    from jax.experimental.pallas import tpu as pltpu
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = n // 2
    qshape = (2, h, n, h)
    gb_pass = 4 * int(np.prod(qshape)) * 4 / 1e9   # per pair call r+w

    def sync(t):
        v = t[0] if isinstance(t, (tuple, list)) else t
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    key = jax.random.PRNGKey(0)
    mk = jax.jit(lambda k: tuple(
        jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
        for kk in jax.random.split(k, 2)))

    def probe(tag, f):
        try:
            ts = {}
            for k in (1, 4):
                def g(a, b, kk=k):
                    for _ in range(kk):
                        a, b = f(a, b)
                    return a, b
                j = jax.jit(g, donate_argnums=(0, 1))
                st = mk(key)
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
            per = (ts[4] - ts[1]) / 3
            print(f"  {tag:34s} {per*1e3:8.3f} ms/pair-call "
                  f"({gb_pass/per:6.0f} GB/s r+w)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  {tag:34s} FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    print(f"== pair-butterfly probe at {n}^3 quarters "
          f"({gb_pass:.1f} GB/pair-call)", flush=True)

    orig_cparams = pb._cparams

    def with_vmem(mb):
        def _cp(N, _mb=None):
            return pltpu.CompilerParams(vmem_limit_bytes=mb * 2 ** 20)
        return _cp

    only = os.environ.get('PROBE_ONLY', '')

    cases = []
    cases.append(('x-pair prod (vmem 120)', None,
                  lambda a, b: pb.fft_axis2_p(a, b, 0, True)))
    cases.append(('z-pair prod (vmem 120)', None,
                  lambda a, b: pb.fft_axis2_p(a, b, 2, True)))
    for mb in (100, 127):
        cases.append((f'x-pair vmem {mb}', mb,
                      lambda a, b: pb.fft_axis2_p(a, b, 0, True)))
    cases.append(('x-pair alias', None,
                  lambda a, b: pb.fft_axis2_p(a, b, 0, True, alias=True)))
    cases.append(('x-pair scaled', None,
                  lambda a, b: pb.fft_axis2_p(a, b, 0, True,
                                              scale=0.5)))

    for tag, mb, f in cases:
        if only and only != tag:
            continue
        pb._cparams = orig_cparams if mb is None else with_vmem(mb)
        try:
            probe(tag, f)
        finally:
            pb._cparams = orig_cparams


if __name__ == '__main__':
    main()
