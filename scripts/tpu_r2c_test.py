"""On-chip check of the r2c/c2r butterfly kernels (Mosaic legality of
flip/concat row ops) + the entry() pipeline, vs numpy."""
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
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    rng = np.random.default_rng(5)
    x = rng.standard_normal((8192, 256)).astype(np.float32)
    t0 = time.perf_counter()
    y = jax.jit(lambda q: pb.rfft_axis_p(q, 1, hext=132))(jnp.asarray(x))
    got = np.asarray(jax.device_get(y))
    print(f"r2c compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    ref = np.fft.rfft(x, axis=1)
    g = got[0][:, :129] + 1j * got[1][:, :129]
    rel = np.linalg.norm(g - ref) / np.linalg.norm(ref)
    tail = float(np.abs(got[:, :, 129:]).max())
    print(f"r2c rel {rel:.2e} tail {tail:.1e}", flush=True)
    assert rel < 1e-5 and tail == 0.0

    t0 = time.perf_counter()
    xr = jax.jit(lambda q: pb.irfft_axis_p(q, 1, 256, scale=1 / 256.))(y)
    xr = np.asarray(jax.device_get(xr))
    print(f"c2r compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    rt = np.linalg.norm(xr - x) / np.linalg.norm(x)
    print(f"c2r roundtrip {rt:.2e}", flush=True)
    assert rt < 1e-5

    # mid + lead variants
    x3 = rng.standard_normal((8, 256, 128)).astype(np.float32)
    y3 = jax.jit(lambda q: pb.rfft_axis_p(q, 1))(jnp.asarray(x3))
    g3 = np.asarray(jax.device_get(y3))
    ref3 = np.fft.rfft(x3, axis=1)
    rel3 = np.linalg.norm(g3[0] + 1j * g3[1] - ref3) / np.linalg.norm(ref3)
    x0 = rng.standard_normal((256, 8, 128)).astype(np.float32)
    y0 = jax.jit(lambda q: pb.rfft_axis_p(q, 0))(jnp.asarray(x0))
    g0 = np.asarray(jax.device_get(y0))
    ref0 = np.fft.rfft(x0, axis=0)
    rel0 = np.linalg.norm(g0[0] + 1j * g0[1] - ref0) / np.linalg.norm(ref0)
    print(f"mid rel {rel3:.2e}  lead rel {rel0:.2e}", flush=True)
    assert rel3 < 1e-5 and rel0 < 1e-5

    # the entry() pipeline end-to-end (r2c 64^3 PlanarPFFT)
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as ge
    fn, args = ge.entry()
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    out_h = np.asarray(jax.device_get(out))
    print(f"entry compile+run {time.perf_counter()-t0:.0f}s "
          f"shape {out_h.shape} finite {np.isfinite(out_h).all()}",
          flush=True)
    print("ALL OK", flush=True)


if __name__ == '__main__':
    main()
