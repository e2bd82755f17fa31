"""Pallas kernel for the 24-direction grouped spatial shift.

The XLA formulation (``ops/shift.py``) is either layout-hostile (skinny
per-group channel slices: 64x lane padding) or read-amplified (mask-and-
accumulate: every output element reads 24 shifted input locations -> ~24x HBM
traffic, ~7 ms per call at 720p).  Here the 24 shifted reads happen in VMEM:
one HBM read of the row window (+8-row halo), one write.

Semantics identical to ``grouped_spatial_shift`` (zero fill at borders comes
from the host-side zero padding — zero fill IS the reference semantics here,
so no validity masking is needed, unlike the CAB kernels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shiftnet_tpu.ops.shift import MAX_SHIFT, shift_dir_table


def _shift_kernel(src_hbm, masks, out_ref, buf, sem, *, tile_h: int,
                  wp: int, w_out: int, c: int, table, dtype):
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    s = MAX_SHIFT
    rows_in = tile_h + 2 * s
    row0 = hi * tile_h
    cp = pltpu.make_async_copy(src_hbm.at[ti, pl.ds(row0, rows_in)], buf, sem)
    cp.start()
    cp.wait()
    src = buf[...]                      # (rows_in, wp, cpad)
    acc = None
    for gi, (c0, csz, dy, dx) in enumerate(table):
        if csz == 0:
            continue
        sl = jax.lax.slice(
            src, (s - dy, s - dx, 0), (s - dy + tile_h, s - dx + w_out, c))
        term = sl * masks[gi].astype(dtype)
        acc = term if acc is None else acc + term
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=('number', 'interpret'))
def grouped_spatial_shift_pallas(hw: jax.Array, number: int,
                                 interpret: bool = False) -> jax.Array:
    t, h, w, c = hw.shape
    assert c == 8 * number
    s = MAX_SHIFT
    cpad = ((c + 127) // 128) * 128
    # rows: +-8 halo; cols: +-8 then align the total width to sublanes.
    w_in = w + 2 * s
    wp = ((w_in + 7) // 8) * 8
    src = jnp.pad(hw, ((0, 0), (s, s), (s, wp - w - s), (0, cpad - c)))

    table = shift_dir_table(number)
    masks = jnp.stack([
        jnp.zeros((cpad,), jnp.float32).at[c0:c0 + csz].set(1.0)
        for c0, csz, dy, dx in table])

    # Mosaic materializes several shifted slabs concurrently; budget the
    # input window plus ~10 tile-sized temporaries.
    fits = lambda th: ((th + 16) * wp * cpad * 2
                       + 10 * th * w * cpad * 2) < 12 * 1024 * 1024
    tile_h = next((th for th in (64, 32, 16, 8, 4, h)
                   if h % th == 0 and fits(th)), None)
    if tile_h is None:  # no fitting tile: XLA fallback
        from shiftnet_tpu.ops.shift import grouped_spatial_shift
        return grouped_spatial_shift(hw, number)
    n_tiles = h // tile_h
    out = pl.pallas_call(
        functools.partial(_shift_kernel, tile_h=tile_h, wp=wp, w_out=w,
                          c=cpad, table=tuple(table), dtype=hw.dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, cpad),
                               lambda ti, hi: (ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, cpad), hw.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * s, wp, cpad), hw.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(src, masks)
    return out[..., :c]
