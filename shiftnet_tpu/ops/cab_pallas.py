"""Fused Pallas kernels for the CAB1/CAB2 shift-block hot path.

Why: TPU convs are XLA custom calls, so the LayerNorm / gates / depthwise /
residual ops around them cannot fuse — every one of the ~10 ops per CAB is a
full HBM round trip, and at 720p a shift-block CAB costs ~40 ms against ~4 ms
of MXU work.  These kernels collapse the CAB body (reference ``CAB1``/``CAB2``,
``gshift_deblur1.py:183-255``) into two passes and 4-5 HBM tensor trips:

  front pass: [CAB2: depthwise 3x3 on the shifted channels] -> LayerNorm ->
    1x1 expand (MXU) -> RepConv2 depthwise 3x3 + identity (VPU) ->
    SimpleGate -> RepConv grouped 5x5 + 3x3 + identity (block-diagonal dense
    matmul taps on the MXU) -> 1x1 expand (MXU) -> SimpleGate2
    => emits the gated tensor ``s`` and per-(frame, tile) channel sums.
  host: channel-attention MLP on the (T, C) means (tiny, plain XLA).
  back pass: out = shortcut + beta * ((s * ca[t]) @ W_proj (+ bias)).

Grid is (T, H/tile_h); each program DMAs its row window (+3-row halo for the
stacked 3x3+5x5 supports) from HBM and keeps all intermediates in VMEM.
Zero row/column padding reproduces the convs' 'SAME' borders exactly.

The fused path is numerically equivalent to the layer-by-layer XLA path
(same op order, f32 matmul accumulation and LN statistics); equivalence is
asserted in tests/test_cab_fused.py.  Training uses the XLA path (no custom
VJP yet); inference/eval uses this one.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def halo_for(add_c: int) -> int:
    # 1 (RepConv2 dw 3x3) + 2 (RepConv 5x5) [+1 for CAB2's leading dw conv1]
    return 4 if add_c else 3


def dense_from_grouped(kernel: jax.Array, groups: int) -> jax.Array:
    """(kh, kw, Cin/G, Cout) grouped kernel -> (kh*kw, Cin, Cout) block-diag
    dense tap stack (tap-major)."""
    kh, kw, cing, cout = kernel.shape
    cin = cing * groups
    per = cout // groups
    dense = jnp.zeros((kh * kw, cin, cout), kernel.dtype)
    for g in range(groups):
        dense = dense.at[:, g * cing:(g + 1) * cing,
                         g * per:(g + 1) * per].set(
            kernel.reshape(kh * kw, cing, cout)[..., g * per:(g + 1) * per])
    return dense


def _dw3x3(slab, dw_ref, rows_out, w, c, *, identity: bool):
    """Depthwise 3x3 (+ optional identity) on VPU.  slab: (rows_out+2, W, C)
    (row halo included); zero column padding; returns (rows_out, W, C) f32."""
    f32 = jnp.float32
    zcol = jnp.zeros((rows_out + 2, 1, c), slab.dtype)
    padded = jnp.concatenate([zcol, slab, zcol], axis=1)
    center = jax.lax.slice(slab, (1, 0, 0), (1 + rows_out, w, c)).astype(f32)
    acc = center if identity else jnp.zeros_like(center)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(padded, (dy, dx, 0),
                                (dy + rows_out, dx + w, c))
            acc = acc + tap.astype(f32) * dw_ref[dy * 3 + dx, :].astype(f32)
    return acc


def _gate_kernel(x_hbm, hw_hbm, ln_w, ln_b, w0, dw0, dwc,
                 g_ref, gsums_ref, xbuf, hwbuf, sem1, sem2, *,
                 tile_h: int, w: int, w_real: int, c: int, add_c: int,
                 halo: int, eps: float, dtype):
    """Kernel A: [CAB2 dw conv1] -> LayerNorm -> 1x1 expand -> RepConv2
    (dw 3x3 + identity) -> SimpleGate.  Emits g with a 2-row halo margin
    (kernel B needs +-2 rows for the 5x5 RepConv): g rows cover
    [hi*tile_h - 2, hi*tile_h + tile_h + 2) of the image, stored in
    (t, n_tiles, tile_h+4, w, c) without overlap in HBM."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    f32 = jnp.float32
    rows_in = tile_h + 2 * halo
    row0 = hi * tile_h

    cp1 = pltpu.make_async_copy(
        x_hbm.at[ti, pl.ds(row0, rows_in)], xbuf, sem1)
    cp1.start()
    if add_c:
        cp2 = pltpu.make_async_copy(
            hw_hbm.at[ti, pl.ds(row0, rows_in)], hwbuf, sem2)
        cp2.start()
        cp1.wait()
        cp2.wait()
    else:
        cp1.wait()

    xt = xbuf[..., :c]                                  # (rows_in, W, C)

    if add_c:
        hw2 = _dw3x3(hwbuf[..., :add_c], dwc, rows_in - 2, w, add_c,
                     identity=False)
        ln_in = jnp.concatenate(
            [jax.lax.slice(xt, (1, 0, 0), (rows_in - 1, w, c)).astype(f32),
             hw2], axis=-1)
        rows_ln = rows_in - 2                           # tile_h + 4
    else:
        ln_in = xt.astype(f32)
        rows_ln = rows_in                               # tile_h + 6

    mu = jnp.mean(ln_in, axis=-1, keepdims=True)
    xc = ln_in - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (xc * jax.lax.rsqrt(var + eps) * ln_w[...].astype(f32)
          + ln_b[...].astype(f32)).astype(dtype)

    cin_ln = c + add_c
    a = jax.lax.dot_general(
        ln.reshape(rows_ln * w, cin_ln), w0[...],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    a = a.reshape(rows_ln, w, 2 * c)

    # zero out-of-image rows/columns (each conv zero-pads its OWN input in
    # the reference; LN(0) = bias would otherwise leak into halos).
    h_img = pl.num_programs(1) * tile_h
    arow = jax.lax.broadcasted_iota(jnp.int32, (rows_ln, 1, 1), 0) \
        + row0 - 3
    acol = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    a_ok = (arow >= 0) & (arow < h_img) & (acol < w_real)
    a = jnp.where(a_ok, a, jnp.zeros_like(a)).astype(dtype)

    rows_g = rows_ln - 2                                # tile_h + 4
    g2 = _dw3x3(a, dw0, rows_g, w, 2 * c, identity=True)
    g = (g2[..., :c] * g2[..., c:]).astype(dtype)
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows_g, 1, 1), 0) \
        + row0 - 2
    g_ok = (grow >= 0) & (grow < h_img) & (acol < w_real)
    g = jnp.where(g_ok, g, jnp.zeros_like(g))
    g_ref[0, 0] = g
    # central (non-halo) rows feed the mid-CA pooling (denoise variants)
    gsums_ref[0, 0, 0] = jnp.sum(
        jax.lax.slice(g, (2, 0, 0), (2 + tile_h, w, c)).astype(f32),
        axis=(0, 1))


def _rep_kernel(g_ref, cag_ref, rep5, rep3, w4, s_ref, sums_ref, *,
                tile_h: int, w: int, w_real: int, c: int, dtype):
    """Kernel B: [mid-CA scale] -> RepConv (grouped 5x5 + 3x3 + identity via
    block-diagonal dense MXU taps) -> 1x1 expand -> SimpleGate2 (+ CA partial
    sums).  g_ref block: (1, 1, tile_h+4, w, c) — the haloed gate output;
    cag_ref: (1, 1, c) per-frame channel-attention scale (ones for deblur).
    The per-channel scale commutes with the halo (uniform over space), so
    scaling the haloed g equals the reference's CA-then-RepConv order."""
    f32 = jnp.float32
    g = g_ref[0, 0] * cag_ref[0, 0].astype(dtype)
    rows_g = tile_h + 4
    rows_out = tile_h
    zc2 = jnp.zeros((rows_g, 2, c), dtype)
    gp = jnp.concatenate([zc2, g, zc2], axis=1)
    r = jax.lax.slice(g, (2, 0, 0), (2 + rows_out, w, c)).astype(f32)
    for i in range(25):
        dy, dx = divmod(i, 5)
        tap = jax.lax.slice(gp, (dy, dx, 0), (dy + rows_out, dx + w, c))
        r = r + jax.lax.dot_general(
            tap.reshape(rows_out * w, c), rep5[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(rows_out, w, c)
    for i in range(9):
        dy, dx = divmod(i, 3)
        tap = jax.lax.slice(gp, (1 + dy, 1 + dx, 0),
                            (1 + dy + rows_out, 1 + dx + w, c))
        r = r + jax.lax.dot_general(
            tap.reshape(rows_out * w, c), rep3[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(rows_out, w, c)
    r = r.astype(dtype)

    e = jax.lax.dot_general(
        r.reshape(rows_out * w, c), w4[...],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    e = e.reshape(rows_out, w, 2 * c)
    s = (e[..., :c].astype(dtype)
         * jax.nn.sigmoid(e[..., c:]).astype(dtype))
    scol = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    s = jnp.where(scol < w_real, s, jnp.zeros_like(s))
    s_ref[0] = s
    sums_ref[0, 0, 0] = jnp.sum(s.astype(f32), axis=(0, 1))


def _back_kernel(s_ref, ca_ref, w7, b7, short_ref, beta_ref, out_ref, *,
                 use_bias: bool):
    f32 = jnp.float32
    s = s_ref[0]
    th, w, c = s.shape
    scaled = s * ca_ref[0, 0].astype(s.dtype)
    y = jax.lax.dot_general(
        scaled.reshape(th * w, c), w7[...],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    if use_bias:
        y = y + b7[...].astype(f32)
    out_ref[0] = (short_ref[0].astype(f32)
                  + y.reshape(th, w, c) * beta_ref[...].astype(f32)
                  ).astype(s.dtype)


def _should_interpret() -> bool:
    """Interpret-mode when the computation targets CPU (tests / virtual
    meshes); compiled Mosaic on real TPU."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, 'platform', None) == 'cpu'
    return jax.default_backend() != 'tpu'


def pick_tile_h(h: int, w: int, c: int, add_c: int) -> int | None:
    """Largest row tile fitting VMEM.  Mosaic allocates the kernel's buffers
    without cross-stage reuse, so budget against the SUM of live buffers of
    the heavier kernel (A: LN/expand/dw, B: RepConv taps)."""
    lanes = lambda ch: ((ch + 127) // 128) * 128
    wp = ((w + 7) // 8) * 8
    for tile_h in (32, 16, 8, 4):
        if h % tile_h:
            continue
        rows = tile_h + 2 * halo_for(add_c)
        rows_g = tile_h + 4
        a_kernel = (
            rows * wp * lanes(c) * 2 +                    # xbuf
            (rows * wp * lanes(add_c) * 2 if add_c else 0) +
            rows * wp * lanes(c + add_c) * 4 +            # ln f32
            rows * wp * lanes(2 * c) * 4 +                # a f32
            rows * wp * lanes(2 * c) * 4 +                # dw accum f32
            rows_g * wp * lanes(c) * 2                    # g out
        )
        b_kernel = (
            rows_g * wp * lanes(c) * 2 +                  # g in
            rows_g * (wp + 4) * lanes(c) * 2 +            # gp
            tile_h * wp * lanes(c) * 4 +                  # r f32
            tile_h * wp * lanes(2 * c) * 4 +              # e f32
            tile_h * wp * lanes(c) * 2                    # s out
        )
        if max(a_kernel, b_kernel) < 13 * 1024 * 1024:
            return tile_h
    return None


def cab_fused(x: jax.Array, hw: jax.Array | None, params: dict[str, Any], *,
              groups: int, use_last_bias: bool = False, mid_ca: bool = False,
              eps: float = 1e-6, interpret: bool | None = None) -> jax.Array:
    """Fused CAB forward.  ``hw`` is the spatially-shifted extra channels for
    CAB2 (None for CAB1).  ``params``: ln_w, ln_b, w0 (Cin,2C), dw0 (3,3,2C),
    [dwc (3,3,add_c) for CAB2], rep5 (5,5,C/G,C), rep3 (3,3,C/G,C),
    w4 (C,2C), du1 (C,C/r), du2 (C/r,C), w7 (C,C), [b7 (C,)], beta (C,);
    denoise variants additionally du1m/du2m for the mid CALayer2
    (``gshift_denoise1.py:224-229``) with ``mid_ca=True``.
    """
    t, h, w, c = x.shape
    add_c = 0 if hw is None else hw.shape[-1]
    dtype = x.dtype
    tile_h = pick_tile_h(h, w, c, add_c)
    assert tile_h is not None, (h, w, c, add_c)
    n_tiles = h // tile_h
    halo = halo_for(add_c)
    if interpret is None:
        interpret = _should_interpret()

    # Mosaic DMA slices must be (8, 128)-aligned in the last two dims: pad
    # W to a sublane multiple and channels to a lane multiple host-side (the
    # pads fuse into the producer); padded columns are masked in-kernel.
    w_real = w
    wp = ((w + 7) // 8) * 8
    cpad = ((c + 127) // 128) * 128
    acpad = ((add_c + 127) // 128) * 128 if add_c else 128
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, wp - w), (0, cpad - c)))
    hwp = (jnp.pad(hw, ((0, 0), (halo, halo), (0, wp - w), (0, acpad - add_c)))
           if hw is not None
           else jnp.zeros((t, h + 2 * halo, wp, acpad), dtype))
    w = wp

    rep5 = dense_from_grouped(params['rep5'], groups).astype(dtype)
    rep3 = dense_from_grouped(params['rep3'], groups).astype(dtype)
    dw0 = params['dw0'].reshape(9, 2 * c).astype(dtype)
    dwc = (params['dwc'].reshape(9, add_c).astype(dtype)
           if add_c else jnp.zeros((9, 1), dtype))

    grid = (t, n_tiles)
    rows_g = tile_h + 4

    g, gsums = pl.pallas_call(
        functools.partial(_gate_kernel, tile_h=tile_h, w=w, w_real=w_real,
                          c=c, add_c=add_c, halo=halo, eps=eps, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # hw (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln_w
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln_b
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dw0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dwc
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rows_g, w, c),
                         lambda ti, hi: (ti, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, n_tiles, rows_g, w, c), dtype),
            jax.ShapeDtypeStruct((t, n_tiles, 1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * halo, w, cpad), dtype),
            pltpu.VMEM((tile_h + 2 * halo, w, acpad), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, hwp, params['ln_w'].astype(dtype), params['ln_b'].astype(dtype),
      params['w0'].astype(dtype), dw0, dwc)

    if mid_ca:
        # reference denoise mid CALayer2 on the gate output
        gmean = jnp.sum(gsums[:, :, 0], axis=1) / (h * w_real)   # (T, C)
        zm = jnp.maximum(gmean @ params['du1m'].astype(jnp.float32), 0.0)
        cag = jax.nn.sigmoid(zm @ params['du2m'].astype(jnp.float32))
    else:
        cag = jnp.ones((t, c), jnp.float32)

    s, sums = pl.pallas_call(
        functools.partial(_rep_kernel, tile_h=tile_h, w=w, w_real=w_real,
                          c=c, dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rows_g, w, c),
                         lambda ti, hi: (ti, hi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda ti, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),   # cag
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rep5
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rep3
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w4
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, h, w, c), dtype),
            jax.ShapeDtypeStruct((t, n_tiles, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(g, cag.reshape(t, 1, c).astype(dtype), rep5, rep3,
      params['w4'].astype(dtype))

    # Channel attention on per-frame means (reference CALayer2,
    # gshift_deblur1.py:71-87) — tiny, plain XLA.
    mean = (jnp.sum(sums[:, :, 0], axis=1) / (h * w_real))  # (T, C) f32
    z = jnp.maximum(mean @ params['du1'].astype(jnp.float32), 0.0)
    ca = jax.nn.sigmoid(z @ params['du2'].astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_back_kernel, use_bias=use_last_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda ti, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w7
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b7
            pl.BlockSpec((1, tile_h, w, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # beta
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c),
                               lambda ti, hi: (ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), dtype),
        interpret=interpret,
    )(s, ca.reshape(t, 1, c).astype(dtype), params['w7'].astype(dtype),
      params.get('b7', jnp.zeros((c,), jnp.float32)).astype(dtype),
      jnp.pad(x, ((0, 0), (0, 0), (0, w - w_real), (0, 0))),
      params['beta'].astype(dtype))
    return out[:, :, :w_real]
