"""A/B Stockham stage-radix plans on hardware (slope-fitted per pass).

The in-kernel cost of a butterfly pass is dominated by full-state VMEM
sweeps — one per stage — so higher radices (in-register R-point DFT via
_dft_slabs) trade arithmetic for sweeps.  This measures per-pass time of
fft_axis_p at 1024^3 for a list of stage plans, with a cross-plan
correctness check (all plans must agree bit-tightly on the same input).

Run:  python scripts/tpu_radix_ab.py [axis ...] [--n 1024] [--plans a,b;c,d]
Default plans: 4-radix baseline, 8,8,16  16,16,4  8,8,4,4  16,8,8  32,32
"""
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    n = 1024
    plans = ['', '8,8,16', '16,16,4', '8,8,4,4', '16,8,8', '32,32']
    for a in sys.argv[1:]:
        if a.startswith('--n'):
            n = int(a.split('=')[1])
        if a.startswith('--plans'):
            plans = a.split('=')[1].split(';')
    axes = [int(a) for a in args] or [1]

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    key = jax.random.PRNGKey(0)
    # small probe block for correctness (same kernels, small shapes)
    xs = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 256, 128),
                            jnp.float32, -0.5, 0.5)
    ref_small = None

    for plan in plans:
        os.environ['MPI4PY_FFT_TPU_STAGE_PLAN'] = plan
        import mpi4py_fft_tpu.ops.pallas_butterfly as pb
        pb = importlib.reload(pb)
        tag = plan or 'default'
        try:
            got = np.asarray(pb.fft_axis_p(xs, 1, True))
            if ref_small is None:
                ref_small = got
                rel = 0.0
            else:
                rel = (np.abs(got - ref_small).max()
                       / np.abs(ref_small).max())
            assert rel < 1e-5, rel
        except Exception as e:                            # noqa: BLE001
            print(f"plan {tag:12s} CORRECTNESS FAIL: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        for axis in axes:
            try:
                ts = {}
                for k in (1, 5):
                    def f(x, kk=k, ax=axis):
                        for _ in range(kk):
                            x = pb.fft_axis_p(x, ax, True)
                        return x
                    j = jax.jit(f, donate_argnums=(0,))
                    x = jax.jit(lambda kq: jax.random.uniform(
                        kq, (2, n, n, n), jnp.float32, -0.5, 0.5))(key)
                    y = j(x)
                    sync(y)
                    for _ in range(2):
                        y = j(y)
                    sync(y)
                    t0 = time.perf_counter()
                    for _ in range(3):
                        y = j(y)
                    sync(y)
                    ts[k] = (time.perf_counter() - t0) / 3
                    del y
                b = (ts[5] - ts[1]) / 4
                gb2 = 2 * 2 * n ** 3 * 4 / 1e9
                print(f"plan {tag:12s} axis {axis}  per-pass {b*1e3:7.3f} ms"
                      f" ({gb2 / b:6.0f} GB/s r+w)  [rel {rel:.1e}]",
                      flush=True)
            except Exception as e:                        # noqa: BLE001
                print(f"plan {tag:12s} axis {axis}  FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == '__main__':
    main()
