"""Benchmark: 3-D c2c FFT GFLOP/s/chip (5N*log2N flop model) + transposes/s.

North-star config (BASELINE.json): 1024^3 c2c f32.  Runs the
planar-complex pipeline (the TPU production path — no complex-typed HLO;
see mpi4py_fft_tpu/parallel/planar.py) with donated buffers so the
2 x 4 GiB planar volumes fit HBM; falls back to 512^3/256^3 only if the
chip's HBM cannot hold the 1024^3 working set.

Prints a JSON line (re-printed if a later phase improves it; the final
line is the round's number):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "transposes_per_s": ..., "transpose_GBps": ..., "bench_n": ...}

Evidence-loss hardening (round-3 postmortem: the driver-captured bench
timed out cold-compiling the quartered schedule and the round recorded
NO number):
  * The orchestrating parent process never touches the accelerator; all
    device work runs in SEQUENTIAL child processes, each bounded by an
    explicit wall-clock budget (a Mosaic compile cannot be interrupted
    by in-process Python signals — only a kill bounds it, and a child
    releasing the chip on exit also sidesteps any single-owner TPU
    runtime lock).
  * Child 1 measures the proven-fast-compiling in-place schedule; its
    JSON line is printed the moment it lands.
  * Child 2 attempts the quartered out-of-place upgrade with whatever
    budget remains; if it finishes and wins, the improved line is
    re-printed.
  * SIGTERM re-emits the best-so-far line before exit, so a driver kill
    mid-upgrade still leaves the round's evidence on stdout.

vs_baseline is the speedup over single-process numpy (pocketfft) on the
host CPU — the closest stand-in for the reference's FFTW-backed serial
path on this machine (reference perf surface: tests/test_speed.py).
"""
import json
import os
import signal
import subprocess
import sys
import time

_T0 = time.perf_counter()

# real-chip precision tier: f32 (f64 is emulated on TPU)
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')
# keep the superseded two-stage MXU kernel off; the Stockham butterfly
# kernel (docs/kernels.md) is dispatched automatically
os.environ.setdefault('MPI4PY_FFT_TPU_PALLAS', 'off')

import numpy as np

# total wall-clock the bench allows itself (the driver's own timeout is
# unknown; round 3's was blown by one cold compile).  The in-place
# number is secured early; the budget bounds the upgrade attempt.
_BUDGET_S = float(os.environ.get('BENCH_BUDGET_S', 1500))


def _remaining():
    return _BUDGET_S - (time.perf_counter() - _T0)


# ---------------------------------------------------------------------------
# device-side measurement (child processes)
# ---------------------------------------------------------------------------

def _configure_cache():
    """Wisdom analogue: persist compiled plans across bench processes."""
    import jax
    cache = os.environ.get('BENCH_CACHE',
                           '/tmp/mpi4py_fft_tpu_bench.xla_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        # this environment pins the platform; honor an explicit cpu ask
        jax.config.update('jax_platforms', 'cpu')


def _sync(v):
    """Scalar D2H fetch: forces the ordered execution queue to drain
    (block_until_ready is unreliable on tunneled platforms).  Indexes a
    single element — ravel() would materialize a full flattened copy,
    which at 1024^3 is 8.6 GB and OOMs the chip.  Accepts the quartered
    state tuple too (drains via its last quarter — passes execute in
    order, so the last-written quarter bounds the queue)."""
    import jax
    if isinstance(v, tuple):
        v = v[-1]
    return float(np.asarray(jax.device_get(v[(0,) * v.ndim])))


def _bench_fft(n, reps, chain, quartered):
    """Return seconds per single 3-D transform at n^3, or raise."""
    import jax
    import jax.numpy as jnp
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT

    N = (n, n, n)
    pfft = PlanarPFFT(None, N, dtype='F')

    # Production-shaped workload: `chain` normalized-forward/backward
    # pairs fused in ONE jitted call with a DONATED input — XLA then
    # ping-pongs two planar buffers (2 x 8 bytes/elem at f32), which is
    # what lets 1024^3 fit a 16 GB chip.  A spectral solver step runs
    # dozens of transforms per dispatch (36/timestep in the DNS example),
    # so this is the deployment shape, and it also amortizes the
    # per-dispatch tunnel latency of this environment.
    # Quartered out-of-place schedule (PlanarPFFT.forward_fn_q /
    # ops/oop3d.py): every axis pass runs out-of-place (~30% more HBM
    # bandwidth than aliased passes) with peak memory 1.5 volumes.  The
    # state stays quartered across the chain, exactly as a production
    # solver loop would hold it.
    quartered = quartered and pfft.quartered
    if quartered:
        def step(*qs):
            for _ in range(chain):
                qs = pfft.backward_fn_q(
                    pfft.forward_fn_q(qs, normalize=True),
                    normalize=False)
            return qs
        fwd_q = jax.jit(step, donate_argnums=(0, 1, 2, 3))
        fwd = lambda qs: fwd_q(*qs)
    else:
        def step(q):
            for _ in range(chain):
                q = pfft.backward_fn(pfft.forward_fn(q, normalize=True),
                                     normalize=False)
            return q
        fwd = jax.jit(step, donate_argnums=(0,))
    per_call = 2 * chain

    # device-side input: staging 8.6 GB over the tunneled H2D link takes
    # ~5 min at 1024^3; the bench content only needs to be non-trivial
    key = jax.random.PRNGKey(0)
    if quartered:
        qshape = (2, n // 2, n, n // 2)
        p = jax.jit(lambda k: tuple(
            jax.random.uniform(kk, qshape, jnp.float32, -0.5, 0.5)
            for kk in jax.random.split(k, 4)))(key)
    else:
        p = jax.jit(lambda k: jax.random.uniform(
            k, (2,) + N, jnp.float32, -0.5, 0.5))(key)
    print(f"# {n}^3: input staged, compiling "
          f"({'quartered OOP' if quartered else 'in-place'} schedule)...",
          file=sys.stderr, flush=True)
    y = fwd(p)          # compile (donates p)
    _sync(y)
    # WARMUP: the first few post-compile executions pay a ~2 s one-time
    # cost on the tunneled platform (measured: first timed batch 203 ms/
    # transform vs 5 ms steady at 256^3) — run the callable twice more
    # before timing
    for _ in range(2):
        y = fwd(y)
    _sync(y)
    t0 = time.perf_counter()
    _sync(y)
    t_sync = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fwd(y)
    _sync(y)
    t_loop = time.perf_counter() - t0
    # subtract the measured sync roundtrip, but never let it swallow the
    # loop (at small n the tunnel latency is comparable to the work and
    # naive subtraction reports ~0 ms / absurd GFLOP/s)
    return (t_loop - min(t_sync, 0.2 * t_loop)) / (reps * per_call)


def _bench_transposes(n, reps):
    """Transposes/s of the full planar volume (the data-movement path of a
    pencil stage; on >1 devices this is the all-to-all, on 1 chip the HBM
    relayout).  Folded from scripts/bench_transposes.py."""
    import jax
    import jax.numpy as jnp

    ndev = len(jax.devices())
    chain = 4
    if ndev > 1:
        from mpi4py_fft_tpu.parallel import Subcomm, Pencil
        sub = Subcomm(None, [0, 0, 1])
        pA = Pencil(sub, (n, n, n), axis=2)
        pB = pA.pencil(0)

        def rot(x):
            for _ in range(chain // 2):
                x = pB.constrain(x)
                x = pA.constrain(x)
            return x
        f = jax.jit(rot)
        x = jax.device_put(
            jnp.zeros((n, n, n), jnp.float32), pA.boundary_sharding())
        bytes_moved = n ** 3 * 4
    else:
        from jax import lax as _lax

        def rot(x):
            # optimization_barrier pins each transpose as a materialized
            # step: without it XLA collapses chained swapaxes (transpose
            # composes with transpose, and elementwise scaling commutes)
            # into a single relayout — or none — and the bench would
            # report impossible >HBM-roofline rates
            for _ in range(chain):
                x = _lax.optimization_barrier(jnp.swapaxes(x, 0, 2))
            return x
        f = jax.jit(rot, donate_argnums=(0,))
        # one real plane, not the planar pair: the out-of-place transpose
        # needs 2 live volumes, and 2 x 8.6 GB planar would OOM at 1024^3
        x = jnp.zeros((n, n, n), jnp.float32)
        bytes_moved = n ** 3 * 4
    y = f(x)
    _sync(y)
    for _ in range(2):                  # warmup (see _bench_fft)
        y = f(y)
    _sync(y)
    t0 = time.perf_counter()
    _sync(y)
    t_sync = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(y)
    _sync(y)
    t_loop = time.perf_counter() - t0
    dt = (t_loop - min(t_sync, 0.2 * t_loop)) / (reps * chain)
    return 1.0 / dt, bytes_moved / dt / 1e9


def _child_base(n_req, reps, chain):
    """Child 1: correctness anchor + transposes + in-place FFT timing
    (with size fallback).  Prints one JSON line."""
    import jax
    import jax.numpy as jnp
    from mpi4py_fft_tpu.parallel.planar import PlanarPFFT
    _configure_cache()

    # correctness anchor on a small sub-problem (planar vs numpy)
    rng = np.random.default_rng(0)
    m = 64
    pf = PlanarPFFT(None, (m, m, m), dtype='F')
    xs = (rng.standard_normal((m, m, m)) +
          1j * rng.standard_normal((m, m, m))).astype(np.complex64)
    ps = jnp.asarray(np.stack([xs.real, xs.imag]))
    ys = np.asarray(jax.jit(lambda v: pf.forward_fn(v, normalize=False))(ps))
    got = ys[0] + 1j * ys[1]
    ref = np.fft.fftn(xs)
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    assert rel < 1e-4, f"correctness check failed: rel err {rel}"

    tps, tgbps = _bench_transposes(min(n_req, 1024), reps)

    dt = n = None
    for n in [n_req] + [m for m in (512, 256) if m < n_req]:
        try:
            dt = _bench_fft(n, reps, chain, quartered=False)
            break
        except Exception as e:                      # noqa: BLE001
            print(f"# {n}^3 failed ({type(e).__name__}: {str(e)[:120]}); "
                  "falling back", file=sys.stderr, flush=True)
            jax.clear_caches()
    assert dt is not None, "no benchmark size succeeded"
    print(json.dumps({"n": n, "fft_ms": dt * 1e3, "tps": tps,
                      "tgbps": tgbps}), flush=True)


def _child_quartered(n, reps, chain):
    """Child 2: quartered-OOP FFT timing only.  Prints one JSON line."""
    _configure_cache()
    dt = _bench_fft(n, reps, chain, quartered=True)
    print(json.dumps({"fft_ms": dt * 1e3}), flush=True)


# ---------------------------------------------------------------------------
# orchestration (parent process — no accelerator access)
# ---------------------------------------------------------------------------

def _run_child(mode, args, budget):
    """Run a child bench process under ``budget`` seconds; return its
    parsed JSON line or None."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode]
            + [str(a) for a in args],
            stdout=subprocess.PIPE, timeout=budget)
        for ln in out.stdout.decode().splitlines():
            if ln.startswith('{'):
                return json.loads(ln)
        print(f"# {mode} child exited rc={out.returncode} without a "
              "result", file=sys.stderr, flush=True)
    except subprocess.TimeoutExpired:
        print(f"# {mode} child timed out after {budget:.0f}s",
              file=sys.stderr, flush=True)
    except Exception as e:                          # noqa: BLE001
        print(f"# {mode} child failed ({type(e).__name__}: "
              f"{str(e)[:120]})", file=sys.stderr, flush=True)
    return None


def main():
    n_req = int(os.environ.get('BENCH_N', 1024))
    reps = int(os.environ.get('BENCH_REPS', 3))
    # chain: fwd+bwd pairs per jitted call.  At 1024^3 chain must be 1 —
    # chaining two pairs doubles the set of simultaneously-live 8.6 GB
    # planar volumes and XLA falls off the in-place buffer schedule
    # (measured 813 ms/transform at chain=2 vs 95 ms at chain=1 on v5e).
    # At small sizes a longer on-device chain amortizes the ~1.6 ms
    # per-dispatch tunnel latency.
    chain = int(os.environ.get('BENCH_CHAIN', 1 if n_req >= 512 else 4))

    # numpy host baseline: pocketfft GFLOP/s rate, measured at a capped
    # size (1024^3 complex64 fftn takes minutes on this 2-vCPU host and
    # pocketfft's rate is ~size-independent at these volumes); the
    # comparison is rate vs rate under the same 5N log2 N model
    rng = np.random.default_rng(0)
    n_np = int(os.environ.get('BENCH_NP_N', 256))
    xn = (rng.random((n_np,) * 3, dtype=np.float32) +
          1j * rng.random((n_np,) * 3, dtype=np.float32)).astype(np.complex64)
    # best of 3: single-shot pocketfft timing on this shared 2-vCPU host
    # varies ~3x run to run, which made vs_baseline jump across rounds
    dt_np = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.fft.fftn(xn)
        dt_np = min(dt_np, time.perf_counter() - t0)
    flops_np = 5.0 * float(n_np) ** 3 * np.log2(float(n_np) ** 3)
    gflops_np = flops_np / dt_np / 1e9

    state = {'line': None}

    def emit(n, dt, tps, tgbps, schedule):
        ntot = float(n) ** 3
        flops = 5.0 * ntot * np.log2(ntot)  # 5N*log2(N) (BASELINE.json)
        gflops = flops / dt / 1e9
        state['line'] = json.dumps({
            "metric": f"{n}^3 c2c 3D FFT throughput per chip",
            "value": round(gflops, 2),
            "unit": "GFLOP/s (5N log2 N model)",
            "vs_baseline": round(gflops / gflops_np, 2),
            "transposes_per_s": round(tps, 2),
            "transpose_GBps": round(tgbps, 1),
            "bench_n": n,
            # the numpy rate is measured at baseline_n (pocketfft's
            # GFLOP/s is ~size-independent at these volumes);
            # vs_baseline is rate vs rate
            "baseline_n": n_np,
            "fft_ms": round(dt * 1e3, 3),
            "schedule": schedule,
        })
        print(state['line'], flush=True)

    def _bail(signum, frame):          # driver kill: save the evidence
        if state['line'] is not None:
            print(state['line'], flush=True)
        print(f"# bench interrupted by signal {signum} at "
              f"t={time.perf_counter() - _T0:.0f}s", file=sys.stderr,
              flush=True)
        os._exit(0 if state['line'] is not None else 1)
    signal.signal(signal.SIGTERM, _bail)

    # Phase 1 — secure a number on the proven-fast-compiling in-place
    # schedule (plus the transpose rate and correctness anchor).
    base = _run_child('--child-base', [n_req, reps, chain],
                      max(_remaining() - 240.0, 300.0))
    assert base is not None, "base benchmark child produced no result"
    n, dt = base['n'], base['fft_ms'] * 1e-3
    emit(n, dt, base['tps'], base['tgbps'], "in-place")

    # Phase 2 — the quartered OOP upgrade with whatever budget remains.
    budget = _remaining() - 15.0
    if os.environ.get('BENCH_QUARTERED', 'on') == 'on' and budget > 60.0:
        print(f"# attempting quartered OOP upgrade (budget "
              f"{budget:.0f}s)...", file=sys.stderr, flush=True)
        q = _run_child('--child-quartered', [n, reps, chain], budget)
        if q is not None and q['fft_ms'] * 1e-3 < dt:
            emit(n, q['fft_ms'] * 1e-3, base['tps'], base['tgbps'],
                 "quartered-oop")


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--child-base':
        _child_base(*map(int, sys.argv[2:5]))
    elif len(sys.argv) > 1 and sys.argv[1] == '--child-quartered':
        _child_quartered(*map(int, sys.argv[2:5]))
    elif len(sys.argv) > 1 and sys.argv[1] == '--weak-scaling':
        # multi-host mode: timed pencil transposes whose all_to_all group
        # crosses jax.distributed process boundaries, at constant
        # per-process volume (the BASELINE >=70% host->pod protocol,
        # exercised here on a multi-process CPU mesh)
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), 'scripts'))
        import bench_weak_scaling
        bench_weak_scaling.main(*[int(a) for a in sys.argv[2:6]])
    else:
        main()
