"""Empirical probe: HBM->HBM async copy inside a Pallas kernel.

The temporal half-channel shift is a pure (frame, channel-block)
permutation of x; if Mosaic supports direct HBM->HBM DMA (no VMEM
transit), the whole shift is address arithmetic at memory speed.
Also probes a dynamic source frame index and a static 40-row sublane
offset on both ends, which is exactly what the shift needs.

Run on TPU: python tools/probe_hbm_copy.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])


def _copy_kernel(x_hbm, o_hbm, sem, *, t, rows, m):
    ti = pl.program_id(0)
    src_t = jnp.where(ti == 0, 0, ti - 1)
    cp = pltpu.make_async_copy(
        x_hbm.at[src_t, pl.ds(40, rows), pl.ds(0, m)],
        o_hbm.at[ti, pl.ds(40, rows), pl.ds(0, m)], sem)
    cp.start()
    cp.wait()


def probe(t=4, rows=40, c=128, m=1024, dtype=jnp.bfloat16):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((t, c, m)), dtype)
    try:
        out = pl.pallas_call(
            functools.partial(_copy_kernel, t=t, rows=rows, m=m),
            grid=(t,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((t, c, m), dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )(x)
        ref = np.asarray(x, np.float32)
        got = np.asarray(out, np.float32)
        errs = []
        for ti in range(t):
            src = max(0, ti - 1) if ti else 0
            errs.append(np.max(np.abs(got[ti, 40:80] - ref[src, 40:80])))
        err = max(errs)
        print(f'HBM->HBM copy (dyn frame, row off 40): OK err={err}')
        return err == 0.0
    except Exception as e:  # noqa: BLE001
        print(f'HBM->HBM copy: FAIL {type(e).__name__}: {str(e)[:400]}')
        return False


if __name__ == '__main__':
    sys.exit(0 if probe() else 1)
