"""Empirical Mosaic constraint probe: non-16-multiple sublane offsets.

The gsts-fold design (fold the 24-direction grouped spatial shift into the
CAB2 gate kernel) needs the hw-source channels at row offset ``n - add_c``
(= 40 for n=80) of the packed y tensor:

  (a) HBM->VMEM async-copy with a source ROW slice starting at 40
      (bf16 sublane packing is (2,1); 40 is an 8-multiple, not 16);
  (b) value load-slice of a VMEM scratch at sublane offset 8.

Both are exercised here against a jnp reference.  Exit code 0 = both legal
and correct; failures print the Mosaic error.

Run on TPU: python tools/probe_dma_align.py
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


def _dma_off_kernel(x_hbm, o_ref, buf, sem, *, off, rows, m):
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(off, rows), pl.ds(0, m)], buf, sem)
    cp.start()
    cp.wait()
    o_ref[...] = buf[...]


def probe_dma_offset(off, rows=48, m=1024, dtype=jnp.bfloat16):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((128, m)), dtype)
    try:
        out = pl.pallas_call(
            functools.partial(_dma_off_kernel, off=off, rows=rows, m=m),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, m), dtype),
            scratch_shapes=[pltpu.VMEM((rows, m), dtype),
                            pltpu.SemaphoreType.DMA(())],
        )(x)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - x[off:off + rows].astype(jnp.float32))))
        print(f'DMA row-offset {off} ({dtype.__name__}): OK err={err}')
        return err == 0.0
    except Exception as e:  # noqa: BLE001
        print(f'DMA row-offset {off} ({dtype.__name__}): FAIL '
              f'{type(e).__name__}: {str(e)[:300]}')
        return False


def _slice_kernel(x_ref, o_ref, *, off, rows):
    o_ref[...] = x_ref[pl.ds(off, rows), :]


def probe_value_slice(off, rows=40, m=1024, dtype=jnp.bfloat16):
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((128, m)), dtype)
    try:
        out = pl.pallas_call(
            functools.partial(_slice_kernel, off=off, rows=rows),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, m), dtype),
        )(x)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - x[off:off + rows].astype(jnp.float32))))
        print(f'value slice offset {off} ({dtype.__name__}): OK err={err}')
        return err == 0.0
    except Exception as e:  # noqa: BLE001
        print(f'value slice offset {off} ({dtype.__name__}): FAIL '
              f'{type(e).__name__}: {str(e)[:300]}')
        return False


if __name__ == '__main__':
    ok = True
    for off in (40, 8):
        ok &= probe_dma_offset(off)
    for off in (40, 8):
        ok &= probe_value_slice(off)
    sys.exit(0 if ok else 1)
