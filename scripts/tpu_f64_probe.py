"""Measure what precision the planar engine ACTUALLY delivers on the
real chip, per dtype tier — the honest-f64 record (VERDICT r1 weak #3).

The reference's parallel f64 tolerance is 2e-10 (tests/test_mpifft.py:17).
TPUs have no native f64 MXU path; jax x64 einsum under Precision.HIGHEST
is multi-pass bf16.  This prints the measured relative error of a 64^3
planar c2c forward vs numpy f64 for (a) f32 inputs and (b) f64 inputs
with x64 enabled, plus whether the reference tolerance is met.  Output is
committed to docs/precision.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ['MPI4PY_FFT_TPU_X64'] = '1'       # enable the f64 tier
os.environ.setdefault('MPI4PY_FFT_TPU_PALLAS', 'off')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.ops import matfft

    print(f"backend={jax.default_backend()} x64={jax.config.jax_enable_x64}",
          flush=True)
    rng = np.random.default_rng(17)
    m = 64
    z = (rng.standard_normal((m, m, m))
         + 1j * rng.standard_normal((m, m, m)))
    ref = np.fft.fftn(z)

    for dt, tag in ((np.float32, 'f32'), (np.float64, 'f64')):
        p = jnp.asarray(np.stack([z.real, z.imag]).astype(dt))
        t0 = time.perf_counter()
        try:
            y = jax.jit(lambda q: matfft.fftn_p(q, (0, 1, 2), True))(p)
            got = np.asarray(jax.device_get(y))
        except Exception as e:                          # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        dt_s = time.perf_counter() - t0
        g = got[0] + 1j * got[1]
        rel = np.linalg.norm(g - ref) / np.linalg.norm(ref)
        meets_ref_f64 = rel < 2e-10          # reference test_mpifft.py:17
        meets_ref_f32 = rel < 5e-4           # reference test_fftw.py:15
        print(f"{tag}: rel err {rel:.3e}  (compile+run {dt_s:.0f}s)  "
              f"meets ref f64 tol (2e-10): {meets_ref_f64}  "
              f"meets ref f32 tol (5e-4): {meets_ref_f32}", flush=True)


if __name__ == '__main__':
    main()
