"""Out-of-place butterfly pass rates at 1024-length transforms.

In-place aliasing costs ~35% HBM bandwidth (903-1019 GB/s OOP copy vs
602-661 in-place, scripts/tpu_blockshape_probe.py), and at 512^3 the
OOP butterfly pass measured 836 GB/s vs 579 in-place
(scripts/tpu_vpu_probe.py).  A full 1024^3 OOP pass needs 2 x 8.6 GB
volumes (OOM on 16 GB), but each axis pass only needs the FULL extent
of its own axis — so measure true OOP rates on HALF volumes
(4.3 GB in + 4.3 GB out), split along an orthogonal axis:

  axis 0 (lead): half (2, 1024, 1024, 512)   split z
  axis 1 (mid):  half (2, 1024, 1024, 512)   split z
  axis 2 (last): half (2, 512, 1024, 1024)   split x

If these run at ~830+ GB/s the quartered OOP production schedule is
worth building (projected 3-pass total ~62-68 ms vs 86 in-place).

Run:  python scripts/tpu_oop_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')
os.environ.setdefault('MPI4PY_FFT_TPU_INPLACE', 'off')     # OOP kernels

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    key = jax.random.PRNGKey(0)

    def probe(tag, shape, axis):
        try:
            ts = {}
            for k in (1, 5):
                def f(x, kk=k):
                    for _ in range(kk):
                        x = pb.fft_axis_p(x, axis, True)
                    return x
                # donated input: XLA ping-pongs two half-volume buffers
                j = jax.jit(f, donate_argnums=(0,))
                x = jax.jit(lambda kq: jax.random.uniform(
                    kq, shape, jnp.float32, -0.5, 0.5))(key)
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
            gb2 = 2 * int(np.prod(shape)) * 4 / 1e9
            print(f"  {tag:28s} per-half-pass {b*1e3:7.3f} ms "
                  f"({gb2 / b:6.0f} GB/s r+w; full-pass equiv "
                  f"{2*b*1e3:7.3f} ms)", flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"  {tag:28s} FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    n = 1024
    print("== OOP butterfly half-volume passes at N=1024", flush=True)
    probe('axis0 lead (2,N,N,N/2)', (2, n, n, n // 2), 0)
    probe('axis1 mid  (2,N,N,N/2)', (2, n, n, n // 2), 1)
    probe('axis2 last (2,N/2,N,N)', (2, n // 2, n, n), 2)


if __name__ == '__main__':
    main()
