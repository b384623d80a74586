"""Round-3 perf dissection: where do the ~27 ms of non-schedule overhead
at 1024^3 go, and what is the 512^3 anomaly?

First finding (run 1): a PURE COPY kernel with the lead-axis blocking
(2, N, 8, 128) moves only ~316 GB/s — the lead/mid kernels are DMA-bound
by 4 KB strided chunks (each (8,128) f32 tile is 4 KB, and consecutive
tiles of a block are ~1 MB apart), not by the butterfly.  This script
A/Bs chunk-contiguity: blocks that read whole (N, post) slabs per
pre-row are contiguous in HBM and should approach the ~819 GB/s
roofline.

Run on hardware:  python scripts/tpu_r3_profile.py [512] [1024]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mpi4py_fft_tpu.ops import matfft
    from mpi4py_fft_tpu.ops import pallas_butterfly as pb
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT

    jax.config.update('jax_compilation_cache_dir',
                      '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    def sync(v):
        return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))

    def run(tag, fn, mk, reps=5):
        """Chained y = fn(y) timing with honest sync; fresh donated input
        from the factory ``mk`` (donation kills the buffer)."""
        try:
            j = jax.jit(fn, donate_argnums=(0,))
            x = mk()
            gb = x.size * x.dtype.itemsize / 1e9
            t0 = time.perf_counter()
            y = j(x)
            sync(y)
            tc = time.perf_counter() - t0
            for _ in range(2):
                y = j(y)
            sync(y)
            t0 = time.perf_counter()
            sync(y)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(reps):
                y = j(y)
            sync(y)
            t_loop = time.perf_counter() - t0
            dt = (t_loop - min(ts, 0.2 * t_loop)) / reps
            print(f"  {tag:36s} {dt * 1e3:9.3f} ms   "
                  f"({2 * gb / dt:6.0f} GB/s r+w eff, compile {tc:.0f}s)",
                  flush=True)
            del y
            return dt
        except Exception as e:                                # noqa: BLE001
            print(f"  {tag:36s} FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
            return None

    def copy_strided(x):
        """Copy with the lead-axis blocking: (2, N, 8, 128) blocks."""
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...]
        N = x.shape[1]
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[2] // 8, x.shape[3] // 128),
            in_specs=[pl.BlockSpec((2, N, 8, 128), lambda i, j: (0, 0, i, j))],
            out_specs=pl.BlockSpec((2, N, 8, 128), lambda i, j: (0, 0, i, j)),
        )(x)

    def copy_contig(x):
        """Copy with per-pre-row slabs: (2, 1, N, post) blocks (contiguous
        in HBM)."""
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...]
        _, P, N, Q = x.shape
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(P,),
            in_specs=[pl.BlockSpec((2, 1, N, Q), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((2, 1, N, Q), lambda i: (0, i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2 ** 20),
        )(x)

    def mid_contig(x, sign=-1):
        """Mid-axis butterfly with contiguous (2, 1, N, Q) slab blocks:
        in-kernel lane split (N, Q) -> (N, Q//128, 128)."""
        _, P, N, Q = x.shape
        dtype_str = np.dtype(x.dtype).name
        tw_small = jnp.asarray(pb._tw_pack(N, sign, dtype_str))
        T = tw_small.shape[1]
        tw = jnp.broadcast_to(tw_small[:, :, None, None], (2, T, 8, 128))
        tw_spec = pb._bspec((2, T, 8, 128), lambda *g: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

        def k(x_ref, tw_ref, o_ref):
            xr = x_ref[0, 0].reshape(N, Q // 128, 128)
            xi = x_ref[1, 0].reshape(N, Q // 128, 128)
            r, i = pb._butterfly(xr, xi, tw_ref, N, sign)
            o_ref[0, 0] = r.reshape(N, Q)
            o_ref[1, 0] = i.reshape(N, Q)

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(P,),
            in_specs=[pb._bspec((2, 1, N, Q), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM), tw_spec],
            out_specs=pb._bspec((2, 1, N, Q), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2 ** 20),
        )(x, tw)

    for n in [int(a) for a in (sys.argv[1:] or ['512', '1024'])]:
        print(f"== {n}^3 f32 planar ({n**3 * 8 / 2**30:.1f} GiB/volume)",
              flush=True)
        reps = 5 if n >= 1024 else 10

        def mk(shape=None, nn=n):
            key = jax.random.PRNGKey(0)
            sh = shape or (2, nn, nn, nn)
            return jax.jit(lambda k: jax.random.uniform(
                k, sh, jnp.float32, -0.5, 0.5))(key)

        mk4 = functools.partial(mk, (2, n, n * n // 128, 128))
        run('copy strided (2,N,8,128)', copy_strided, mk4, reps)
        run('copy contig (2,1,N,post)', copy_contig,
            functools.partial(mk, (2, n, n, n)), reps)
        run('mid-axis contig butterfly', mid_contig,
            functools.partial(mk, (2, n, n, n)), reps)

        for tag, ax in [('axis0 (lead)', 0), ('axis1 (mid)', 1),
                        ('axis2 (last)', 2)]:
            run(tag, lambda q, a=ax: pb.fft_axis_p(q, a, True), mk, reps)

        # lead-axis variant A/B
        for v in ('1', '2'):
            pb._LEAD_VARIANT = v
            jax.clear_caches()
            run(f'axis0 lead variant {v}',
                lambda q: pb.fft_axis_p(q, 0, True), mk, reps)
        pb._LEAD_VARIANT = '2'
        # last-axis variant A/B
        for v in ('1', '2'):
            pb._LAST_VARIANT = v
            jax.clear_caches()
            run(f'axis2 last variant {v}',
                lambda q: pb.fft_axis_p(q, 2, True), mk, reps)
        pb._LAST_VARIANT = 'auto'
        jax.clear_caches()

        run('fused fwd (3 axes)',
            lambda q: pb.fft_axis_p(
                pb.fft_axis_p(pb.fft_axis_p(q, 2, True), 1, True), 0, True),
            mk, reps)

        pfft = PlanarPFFT(None, (n, n, n), dtype='F')
        run('PlanarPFFT fwd', lambda q: pfft.forward_fn(q, True), mk, reps)
        run('PlanarPFFT fwd+bwd pair',
            lambda q: pfft.backward_fn(pfft.forward_fn(q, True), False),
            mk, reps)


if __name__ == '__main__':
    main()
