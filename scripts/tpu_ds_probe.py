"""On-chip double-single tier probe: accuracy + throughput.

(a) accuracy of the DS butterfly on REAL hardware (Mosaic must not have
    value-changing fusions for the error-free transforms to hold — this
    is the empirical check the module docs call for);
(b) throughput of a chained DS lead-axis pass at production-ish volume
    vs the f32 butterfly and vs the x64 einsum engine (the current
    on-chip f64 path).

Run:  python scripts/tpu_ds_probe.py
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
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.ops import pallas_ds as ds
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    rng = np.random.default_rng(3)

    # ---- (a) accuracy on chip ----------------------------------------
    N, B = 256, 16
    z = rng.standard_normal((N, B, 128)) + 1j * rng.standard_normal((N, B, 128))
    p = jnp.asarray(ds.to_ds(z))
    y = ds.fft_axis_ds(p, 0, True, interpret=False)
    got = ds.from_ds(np.asarray(jax.device_get(y)))
    ref = np.fft.fft(z, axis=0)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"DS on-chip accuracy  N={N}: rel={rel:.3e} "
          f"(d-tier tol 2e-10: {'MEET' if rel < 2e-10 else 'FAIL'})",
          flush=True)

    # f32 kernel reference point on the same problem
    p32 = jnp.asarray(np.stack([z.real, z.imag]).astype(np.float32))
    y32 = pb.fft_axis_p(
        jnp.asarray(np.ascontiguousarray(
            np.stack([z.real, z.imag]).astype(np.float32)
            .reshape(2, N, B * 128 // 128, 128))), 0, True,
        interpret=False)
    g32 = np.asarray(jax.device_get(y32))
    rel32 = np.linalg.norm((g32[0] + 1j * g32[1]).reshape(ref.shape) - ref) \
        / np.linalg.norm(ref)
    print(f"f32 kernel accuracy  N={N}: rel={rel32:.3e}", flush=True)

    # ---- (b) throughput ----------------------------------------------
    # chained lead-axis passes at a production-ish volume
    NN, POST = 512, 1024 * 1024 // 2      # 512 * 512k = 256M logical elems
    shape = (NN, POST // 1024, 1024)
    logical_gb = 2 * int(np.prod(shape)) * 8 / 1e9   # complex128 volume

    def timeit(tag, mkstate, step, gb_moved, flops):
        try:
            ts = {}
            for k in (1, 3):
                f = jax.jit(lambda s, kk=k: _chain(s, step, kk),
                            donate_argnums=(0,))
                st = mkstate()
                st = f(st)
                sync(st)
                st = f(st)
                sync(st)
                t0 = time.perf_counter()
                for _ in range(3):
                    st = f(st)
                sync(st)
                ts[k] = (time.perf_counter() - t0) / 3
                del st
            per = (ts[3] - ts[1]) / 2
            print(f"  {tag:28s} {per*1e3:9.2f} ms/pass "
                  f"({gb_moved/per:6.0f} GB/s, {flops/per/1e9:7.0f} "
                  "GFLOP/s)", flush=True)
            return per
        except Exception as e:                        # noqa: BLE001
            print(f"  {tag:28s} FAILED {type(e).__name__}: "
                  f"{str(e)[:130]}", flush=True)
            return None

    def _chain(s, step, k):
        for i in range(k):
            s = step(s, i)
        return s

    key = jax.random.PRNGKey(0)
    flops_pass = 5 * int(np.prod(shape)) * np.log2(NN)

    # DS kernel: (2,2)+shape f32, 16 bytes/elem moved r+w -> 2x
    ds_gb = 2 * 4 * int(np.prod(shape)) * 4 / 1e9
    timeit('DS butterfly (lead)',
           lambda: jax.jit(lambda k: jax.random.uniform(
               k, (2, 2) + shape, jnp.float32, -0.5, 0.5))(key),
           lambda s, i: ds.fft_axis_ds(s, 0, True, interpret=False),
           ds_gb, flops_pass)

    # f32 kernel on the same logical volume ((2,)+shape, 8 B/elem r+w)
    f32_gb = 2 * 2 * int(np.prod(shape)) * 4 / 1e9
    timeit('f32 butterfly (lead)',
           lambda: jax.jit(lambda k: jax.random.uniform(
               k, (2,) + shape, jnp.float32, -0.5, 0.5))(key),
           lambda s, i: pb.fft_axis_p(s, 0, True),
           f32_gb, flops_pass)

    # x64 einsum engine (the current on-chip f64 path) on a SMALLER
    # volume (it is known to be far off the roofline)
    os.environ['MPI4PY_FFT_TPU_X64'] = '1'
    jax.config.update('jax_enable_x64', True)
    shape_e = (256, 256, 1024)
    flops_e = 5 * int(np.prod(shape_e)) * np.log2(shape_e[0])
    gb_e = 2 * 2 * int(np.prod(shape_e)) * 8 / 1e9
    from mpi4py_fft_tpu.ops import matfft

    timeit('x64 einsum engine (lead)',
           lambda: jax.jit(lambda k: jax.random.uniform(
               k, (2,) + shape_e, jnp.float64, -0.5, 0.5))(key),
           lambda s, i: matfft.fft1d_p(s, 0, True), gb_e, flops_e)


if __name__ == '__main__':
    main()
