"""Probe Mosaic legality of the in-kernel moves the PACKED r2c kernel
needs: leading-axis strided slice (even/odd deinterleave), leading-axis
reversal (Hermitian unpack), and the concat-of-pages fallback.

Each candidate runs in its own tiny pallas_call with try/except so one
illegal lowering cannot poison the others' verdicts (each is a separate
compile).  Run on the real chip: python scripts/tpu_probe_moves.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault('MPI4PY_FFT_TPU_X64', '0')

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, S, L = 64, 8, 128


def run(name, body):
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])
    x = np.arange(N * S * L, dtype=np.float32).reshape(N, S, L)
    try:
        out_shape = jax.eval_shape(body, jnp.zeros((N, S, L), jnp.float32))
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape.shape, np.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ref = np.asarray(body(jnp.asarray(x)))
        ok = np.array_equal(np.asarray(y), ref)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}", flush=True)
        return ok
    except Exception as e:                                  # noqa: BLE001
        msg = str(e).replace('\n', ' ')[:110]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    print('backend:', jax.default_backend(), flush=True)
    run('lead strided x[0::2]', lambda x: x[0::2])
    run('lead strided x[1::2]', lambda x: x[1::2])
    run('lead flip jnp.flip(x,0)', lambda x: jnp.flip(x, axis=0))
    run('lead neg-step x[::-1]', lambda x: x[::-1])
    run('pltpu.roll lead', lambda x: pltpu.roll(x, shift=1, axis=0))
    run('concat pages reversal',
        lambda x: jnp.concatenate([x[i:i + 1]
                                   for i in range(N - 1, -1, -1)], axis=0))
    run('concat pages deinterleave',
        lambda x: jnp.concatenate([x[2 * i:2 * i + 1]
                                   for i in range(N // 2)], axis=0))
    run('reshape pair-split (N/2,2,S,L) take even',
        lambda x: x.reshape(N // 2, 2, S, L)[:, 0])
    run('sublane flip jnp.flip(x,1)', lambda x: jnp.flip(x, axis=1))


if __name__ == '__main__':
    main()
