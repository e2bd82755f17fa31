"""Probe: temporal-shift copy bandwidth — HBM->HBM DMA vs VMEM transit.

The fused shift-round kernel builds y with direct HBM->HBM copies of
(C/2-row, full-lane) blocks; in-context that stage costs ~6.3 ms per L1
round (T=12) against a ~2 ms two-pass HBM floor.  This measures, at the
real L1 shape, (a) the direct HBM->HBM per-frame channel-permutation copy,
(b) the same permutation routed through VMEM row tiles (read slab + write
tile, 2-slot pipelined), (c) a plain jnp copy of the same bytes (XLA
baseline).

Run on TPU: python tools/probe_copy_bw.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def timeit(name, fn, *args, iters=20, nbytes=0):
    out = fn(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    bw = nbytes * 2 / dt / 1e9  # read+write
    print(f'{name}: {dt * 1e3:.2f} ms  ({bw:.0f} GB/s r+w)', flush=True)
    return dt


def _hbm_kernel(x_hbm, y_hbm, sem, *, t, half, pp, cb):
    ti = pl.program_id(0)
    src = jnp.where(ti == 0, t - 1, ti - 1)
    for p in range(pp):
        pltpu.make_async_copy(
            x_hbm.at[src, pl.ds(p * cb + half, half)],
            y_hbm.at[ti, pl.ds(p * cb, half)], sem).start()
        pltpu.make_async_copy(
            x_hbm.at[ti, pl.ds(p * cb, half)],
            y_hbm.at[ti, pl.ds(p * cb + half, half)], sem).start()
    for _ in range(2 * pp):
        pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(0, half)], y_hbm.at[0, pl.ds(0, half)],
            sem).wait()


def _vmem_kernel(x_hbm, y_hbm, buf, sem, osem, *, t, half, pp, cb, tl,
                 n_tiles):
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    g = ti * n_tiles + hi
    total = t * n_tiles
    slot = jax.lax.rem(g, 2)

    def start(gg, sl):
        ti2 = gg // n_tiles
        lane0 = jax.lax.rem(gg, n_tiles) * tl
        src = jnp.where(ti2 == 0, t - 1, ti2 - 1)
        for p in range(pp):
            pltpu.make_async_copy(
                x_hbm.at[src, pl.ds(p * cb + half, half), pl.ds(lane0, tl)],
                buf.at[sl, pl.ds(p * cb, half)], sem.at[sl]).start()
            pltpu.make_async_copy(
                x_hbm.at[ti2, pl.ds(p * cb, half), pl.ds(lane0, tl)],
                buf.at[sl, pl.ds(p * cb + half, half)], sem.at[sl]).start()

    @pl.when(g == 0)
    def _():
        start(0, 0)

    @pl.when(g + 1 < total)
    def _():
        start(g + 1, jax.lax.rem(g + 1, 2))

    @pl.when(g >= 2)
    def _():
        pltpu.make_async_copy(buf.at[slot], y_hbm.at[0, :, pl.ds(0, tl)],
                              osem.at[slot]).wait()
    for _ in range(2 * pp):
        pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(0, half), pl.ds(0, tl)],
            buf.at[slot, pl.ds(0, half)], sem.at[slot]).wait()
    pltpu.make_async_copy(
        buf.at[slot], y_hbm.at[ti, :, pl.ds(hi * tl, tl)],
        osem.at[slot]).start()

    @pl.when(g == total - 1)
    def _():
        pltpu.make_async_copy(buf.at[slot], y_hbm.at[0, :, pl.ds(0, tl)],
                              osem.at[slot]).wait()

    @pl.when((g == total - 1) & (total > 1))
    def _():
        pltpu.make_async_copy(buf.at[1 - slot], y_hbm.at[0, :, pl.ds(0, tl)],
                              osem.at[1 - slot]).wait()


def main():
    t, pp, cb, lp = 12, 4, 80, 72320
    half = 40
    dt_ = jnp.bfloat16
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((t, pp * cb, lp)), dt_)
    nbytes = t * pp * cb * lp * 2

    hbm = jax.jit(pl.pallas_call(
        functools.partial(_hbm_kernel, t=t, half=half, pp=pp, cb=cb),
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t, pp * cb, lp), dt_),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    ))
    timeit('HBM->HBM direct (frame grid)', hbm, x, nbytes=nbytes)

    # VMEM transit, lane tiles
    for n_tiles in (8, 16):
        assert lp % n_tiles == 0 or True
        tl = lp // n_tiles
        tl -= tl % 128
        used = tl * n_tiles
        vm = jax.jit(pl.pallas_call(
            functools.partial(_vmem_kernel, t=t, half=half, pp=pp, cb=cb,
                              tl=tl, n_tiles=n_tiles),
            grid=(t, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((t, pp * cb, lp), dt_),
            scratch_shapes=[
                pltpu.VMEM((2, pp * cb, tl), dt_),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ))
        timeit(f'VMEM transit ({n_tiles} lane tiles of {tl})', vm, x,
               nbytes=nbytes * used // lp)

    roll = jax.jit(lambda v: jnp.concatenate(
        [jnp.roll(v, 1, 0)[:, half:2 * half], v[:, :half]], 1))
    timeit('XLA slice+concat (half tensor)', roll, x,
           nbytes=nbytes // pp // 2)


if __name__ == '__main__':
    main()
