"""On-chip smoke test: the FULL-featured PFFT runs on the real TPU.

Exercises the unified complex-free pipeline (VERDICT r1 item 1): buffer
style calls with DistArray, pure fn_p composition, r2c + c2c + collapse +
padding + r2r transforms — all on the chip, no complex-typed HLO.

Run on hardware:  python scripts/tpu_pfft_smoke.py
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
    assert jax.default_backend() == 'tpu', jax.default_backend()
    from mpi4py_fft_tpu import PFFT, newDistArray, fftw

    t0 = time.time()
    rng = np.random.default_rng(0)

    # 1. r2c 3-D, buffer style with DistArray
    shape = (64, 64, 64)
    fft = PFFT(None, shape, dtype='f')
    u = newDistArray(fft, False)
    u[:] = rng.random(shape).astype('f')
    X = np.asarray(u).copy()
    u_hat = fft.forward(u)
    ref = np.fft.rfftn(X) / np.prod(shape)
    rel = np.linalg.norm(np.asarray(u_hat) - ref) / np.linalg.norm(ref)
    print(f"r2c fwd rel err vs numpy: {rel:.3e}", flush=True)
    assert rel < 1e-5
    uj = fft.backward(u_hat)
    rel = np.linalg.norm(np.asarray(uj) - X) / np.linalg.norm(X)
    print(f"r2c roundtrip rel err:    {rel:.3e}", flush=True)
    assert rel < 1e-5

    # 2. c2c via complex DistArray (complex only at the host boundary)
    fftc = PFFT(None, (32, 48, 64), dtype='F')
    uc = newDistArray(fftc, False)
    zc = (rng.random(uc.shape) + 1j * rng.random(uc.shape)).astype('F')
    uc[:] = zc
    uhc = fftc.forward(uc)
    refc = np.fft.fftn(zc) / np.prod(zc.shape)
    rel = np.linalg.norm(np.asarray(uhc) - refc) / np.linalg.norm(refc)
    print(f"c2c fwd rel err vs numpy: {rel:.3e}", flush=True)
    assert rel < 1e-5

    # 3. collapse + padding + r2r transforms, pure fn_p under one jit
    dctn = functools.partial(fftw.dctn, type=2)
    idctn = functools.partial(fftw.idctn, type=2)
    fr = PFFT(None, (16, 24, 32), axes=((0,), (1,), (2,)),
              transforms={(2,): (dctn, idctn)}, dtype='f')
    x = rng.random((16, 24, 32)).astype('f')
    y = np.asarray(jax.jit(fr.forward.fn_p)(x))
    back = np.asarray(jax.jit(fr.backward.fn_p)(y))
    rel = np.linalg.norm(back - x) / np.linalg.norm(x)
    print(f"r2r-mix roundtrip rel:    {rel:.3e}", flush=True)
    assert rel < 1e-5

    fp = PFFT(None, (32, 32, 32), padding=[1.5] * 3, dtype='f')
    uh = newDistArray(fp, True)
    uh[:] = (rng.random(uh.shape) + 1j * rng.random(uh.shape)).astype(uh.dtype)
    up = fp.backward(uh)
    uh2 = fp.forward(up)
    up2 = fp.backward(uh2)
    uh3 = fp.forward(up2)
    rel = (np.linalg.norm(np.asarray(uh3) - np.asarray(uh2))
           / np.linalg.norm(np.asarray(uh2)))
    print(f"padded spectral fixpoint: {rel:.3e}", flush=True)
    assert rel < 1e-4

    print(f"ALL OK in {time.time() - t0:.1f}s", flush=True)


if __name__ == '__main__':
    main()
