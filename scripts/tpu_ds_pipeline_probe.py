"""On-chip probe: the PRODUCTION double-single f64 pipeline.

Round-4 shipped the DS kernel as an isolated lead-axis prototype; this
round wires it into PlanarPFFT (dtype='d'/'D' on TPU dispatches the DS
tier end-to-end).  This probe measures, on the real chip:

(a) accuracy of the full 3-D DS pipeline (c2c and r2c) vs numpy f64 —
    must be <= 2e-10 (the reference's d-tier parallel tolerance,
    reference: tests/test_mpifft.py:17);
(b) throughput of the DS pipeline at 256^3 (fwd+bwd roundtrip chain)
    vs the x64 einsum engine (the previous on-chip f64 path) — the
    VERDICT target is >= 20x.

Run:  python scripts/tpu_ds_pipeline_probe.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
# x64 must stay ON for the f64 boundary arrays
os.environ['MPI4PY_FFT_TPU_X64'] = '1'

import numpy as np


def main(n=256):
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT
    from mpi4py_fft_tpu.ops import pallas_ds as ds

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    rng = np.random.default_rng(11)
    N3 = float(n) ** 3
    flops = 5.0 * N3 * np.log2(N3)          # per 3-D c2c transform

    # ---- (a) accuracy at a checkable size ----------------------------
    m = 128
    pD = PlanarPFFT(None, (m,) * 3, dtype='D')
    assert pD._ds, "DS tier not dispatched for dtype='D'"
    z = rng.standard_normal((m,) * 3) + 1j * rng.standard_normal((m,) * 3)
    x = jnp.asarray(np.stack([z.real, z.imag]))
    uh = np.asarray(jax.device_get(pD.forward(x)))
    ref = np.fft.fftn(z) / z.size
    rel = np.linalg.norm((uh[0] + 1j * uh[1]) - ref) / np.linalg.norm(ref)
    print(f"DS c2c pipeline accuracy {m}^3: rel={rel:.3e} "
          f"({'MEET' if rel < 2e-10 else 'FAIL'} 2e-10)", flush=True)

    pd = PlanarPFFT(None, (m,) * 3, dtype='d')
    assert pd._ds, "DS tier not dispatched for dtype='d'"
    xr = rng.standard_normal((m,) * 3)
    uhr = np.asarray(jax.device_get(pd.forward(jnp.asarray(xr))))
    refr = np.fft.rfftn(xr) / xr.size
    relr = np.linalg.norm((uhr[0] + 1j * uhr[1]) - refr) \
        / np.linalg.norm(refr)
    print(f"DS r2c pipeline accuracy {m}^3: rel={relr:.3e} "
          f"({'MEET' if relr < 2e-10 else 'FAIL'} 2e-10)", flush=True)
    rb = np.asarray(jax.device_get(pd.backward(jnp.asarray(uhr))))
    relrt = np.linalg.norm(rb - xr) / np.linalg.norm(xr)
    print(f"DS r2c roundtrip   {m}^3: rel={relrt:.3e}", flush=True)

    # ---- (b) throughput at n^3 ---------------------------------------
    def bench(dtype, label, reps=3, chain=2):
        p = PlanarPFFT(None, (n,) * 3, dtype=dtype)
        used_ds = p._ds

        def step(q):
            for _ in range(chain):
                q = p.backward_fn(p.forward_fn(q, normalize=True),
                                  normalize=False)
            return q

        shape = ((2,) + (n,) * 3) if dtype == 'D' else (n,) * 3
        x0 = jax.jit(lambda k: jax.random.uniform(
            k, shape, jnp.float64, -0.5, 0.5))(jax.random.PRNGKey(0))
        f = jax.jit(step, donate_argnums=(0,))
        y = f(x0)
        sync(y)
        y = f(y)
        sync(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(y)
        sync(y)
        dt = (time.perf_counter() - t0) / (reps * chain * 2)
        eff_flops = flops if dtype == 'D' else flops / 2
        print(f"{label}: {dt * 1e3:.2f} ms/transform  "
              f"{eff_flops / dt / 1e9:.1f} GF/s  (ds={used_ds})",
              flush=True)
        return dt

    t_ds = bench('D', f"DS  c2c {n}^3")
    t_dsr = bench('d', f"DS  r2c {n}^3")

    # einsum engine comparison (the old on-chip f64 path)
    ds.set_ds_mode('off')
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        t_es = bench('D', f"x64 c2c {n}^3 (einsum engine)", reps=1,
                     chain=1)
    ds.set_ds_mode('auto')
    print(f"DS speedup over einsum engine: {t_es / t_ds:.1f}x "
          f"({'MEET' if t_es / t_ds >= 20 else 'BELOW'} the 20x target)",
          flush=True)


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:2]))
