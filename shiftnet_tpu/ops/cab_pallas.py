"""Fused Pallas kernels for the CAB1/CAB2 hot path.

Why: on TPU every conv is an XLA custom call — LayerNorm, gates, shifts and
residuals around them cannot fuse, so each of the ~10 ops per CAB is a full
HBM round trip.  At 720p a single shift-block CAB costs ~50 ms while its
arithmetic is ~4 ms of MXU time.  These kernels collapse the CAB body into
two passes with 4 HBM trips total:

  pass A (``cab_front``): LayerNorm -> 1x1 expand (MXU) -> depthwise 3x3
    (VPU, RepConv2 incl. identity) -> SimpleGate -> RepConv (grouped kxk as
    block-diagonal dense matmul taps on the MXU + identity) -> 1x1 expand
    (MXU) -> SimpleGate2, emitting the gated tensor ``s`` and per-frame
    channel sums for the channel-attention pooling.
  host: the tiny CA MLP on the (T, C) means (plain XLA).
  pass B (``cab_back``): y = shortcut + beta * ((s * ca_scale) @ W_proj).

Reference semantics: ``CAB1``/``CAB2`` (``gshift_deblur1.py:183-255``).
Grid: (T, H-tiles); each program holds full W rows in VMEM with a 1+k//2-row
halo for the depthwise + grouped convs.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dense_from_grouped(kernel: jax.Array, groups: int) -> jax.Array:
    """(kh, kw, Cin/G, Cout) grouped kernel -> (kh, kw, Cin, Cout) block-diag."""
    kh, kw, cing, cout = kernel.shape
    cin = cing * groups
    per = cout // groups
    dense = jnp.zeros((kh, kw, cin, cout), kernel.dtype)
    for g in range(groups):
        dense = dense.at[:, :, g * cing:(g + 1) * cing,
                         g * per:(g + 1) * per].set(
            kernel[..., g * per:(g + 1) * per])
    return dense


def _front_kernel(x_ref, ln_w_ref, ln_b_ref, w0_ref, dw_ref, rep5_ref,
                  rep3_ref, w4_ref, s_ref, sums_ref, *, halo: int,
                  tile_h: int, c: int, c2: int, eps: float):
    """One (frame, row-tile): rows [i*tile_h - halo, i*tile_h + tile_h + halo).

    x_ref: (1, tile_h + 2*halo, W, Cin)  (pre-padded rows via index clamp)
    s_ref: (1, tile_h, W, C)
    sums_ref: (1, 1, C) partial sum of s over this tile (f32)
    """
    xt = x_ref[0]                                   # (th+2h, W, Cin)
    f32 = jnp.float32

    # LayerNorm over channels (fp32 stats).
    x32 = xt.astype(f32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ln = (xc * jax.lax.rsqrt(var + eps) * ln_w_ref[...].astype(f32)
          + ln_b_ref[...].astype(f32)).astype(xt.dtype)

    # 1x1 expand to 2C on the MXU.
    h_all, w_all = ln.shape[0], ln.shape[1]
    a = jax.lax.dot_general(
        ln.reshape(h_all * w_all, ln.shape[2]), w0_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(h_all, w_all, c2).astype(xt.dtype)

    # RepConv2: depthwise 3x3 + identity (VPU, zero-padded columns).
    ap = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))
    acc = a.astype(f32)
    for dy in range(-1, 2):
        ys = slice(1 + dy, 1 + dy + h_all) if False else None
    acc = a.astype(f32)
    ap2 = jnp.pad(a, ((1, 1), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(ap2, (dy, dx, 0), (dy + h_all, dx + w_all, c2))
            acc = acc + tap.astype(f32) * dw_ref[dy, dx, :].astype(f32)
    a = acc.astype(xt.dtype)

    # SimpleGate.
    g = a[..., :c] * a[..., c:]

    # RepConv: grouped 5x5 + grouped 3x3 + identity as dense block-diag
    # matmul taps on the MXU. rep5_ref: (5, 5, C, C) dense; rep3: (3, 3, C, C).
    gp = jnp.pad(g, ((2, 2), (2, 2), (0, 0)))
    r = g.astype(f32)
    for dy in range(5):
        for dx in range(5):
            tap = jax.lax.slice(gp, (dy, dx, 0), (dy + h_all, dx + w_all, c))
            r = r + jax.lax.dot_general(
                tap.reshape(h_all * w_all, c), rep5_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(h_all, w_all, c)
    gp3 = jnp.pad(g, ((1, 1), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(gp3, (dy, dx, 0), (dy + h_all, dx + w_all, c))
            r = r + jax.lax.dot_general(
                tap.reshape(h_all * w_all, c), rep3_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(h_all, w_all, c)
    r = r.astype(xt.dtype)

    # 1x1 expand + SimpleGate2; keep only the valid (non-halo) rows.
    rv = jax.lax.slice(r, (halo, 0, 0), (halo + tile_h, w_all, c))
    e = jax.lax.dot_general(
        rv.reshape(tile_h * w_all, c), w4_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(tile_h, w_all, c2)
    s = (e[..., :c] * jax.nn.sigmoid(e[..., c:])).astype(xt.dtype)

    s_ref[0] = s
    sums_ref[0, 0] = jnp.sum(s.astype(f32), axis=(0, 1))


def _back_kernel(s_ref, ca_ref, w7_ref, b7_ref, short_ref, beta_ref, out_ref,
                 *, c: int, use_bias: bool):
    f32 = jnp.float32
    s = s_ref[0]
    th, w_all = s.shape[0], s.shape[1]
    scaled = s * ca_ref[0].astype(s.dtype)
    y = jax.lax.dot_general(
        scaled.reshape(th * w_all, c), w7_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    if use_bias:
        y = y + b7_ref[...].astype(f32)
    y = y.reshape(th, w_all, c)
    out_ref[0] = (short_ref[0].astype(f32)
                  + y * beta_ref[...].astype(f32)).astype(s.dtype)


def _row_padded(x: jax.Array, halo: int) -> jax.Array:
    """Pad rows by `halo` with zeros (conv 'SAME' semantics at tile edges)."""
    return jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=('groups', 'mid_ca', 'use_last_bias', 'tile_h', 'eps'))
def cab_fused(x, params: dict[str, Any], *, groups: int,
              mid_ca: bool = False, use_last_bias: bool = False,
              tile_h: int = 16, eps: float = 1e-6):
    """Fused CAB1 forward (big-variant layout: no mid CA).

    x: (T, H, W, C) input (the LN/shortcut source).
    params: {'ln_w','ln_b','w0' (C,2C),'dw' (3,3,2C),'rep5' (5,5,C/G? dense),
             'rep3', 'w4' (C,2C), 'du1' (C, C/r), 'du2' (C/r, C),
             'w7' (C,C), 'b7' (C,) optional, 'beta' (C,)}
    """
    assert not mid_ca, 'denoise mid-CA variant not fused yet'
    t, h, w, c = x.shape
    c2 = 2 * c
    halo = 3  # 1 (dw3x3) + 2 (rep 5x5)
    n_tiles = (h + tile_h - 1) // tile_h
    assert h % tile_h == 0, (h, tile_h)
    dtype = x.dtype

    xp = _row_padded(x, halo)

    grid = (t, n_tiles)
    s, sums = pl.pallas_call(
        functools.partial(_front_kernel, halo=halo, tile_h=tile_h, c=c,
                          c2=c2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h + 2 * halo, w, c),
                         lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rep5 dense
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rep3 dense
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w4
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda ti, hi: (ti, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, h, w, c), dtype),
            jax.ShapeDtypeStruct((t, n_tiles, c), jnp.float32),
        ],
    )(xp, params['ln_w'].astype(dtype), params['ln_b'].astype(dtype),
      params['w0'].astype(dtype), params['dw'].astype(dtype),
      _dense_from_grouped(params['rep5'], groups).astype(dtype),
      _dense_from_grouped(params['rep3'], groups).astype(dtype),
      params['w4'].astype(dtype))

    # Channel attention on per-frame means (tiny; plain XLA).
    mean = jnp.sum(sums, axis=1) / (h * w)               # (T, C) f32
    z = jnp.maximum(mean @ params['du1'].astype(jnp.float32), 0.0)
    ca = jax.nn.sigmoid(z @ params['du2'].astype(jnp.float32))  # (T, C)

    out = pl.pallas_call(
        functools.partial(_back_kernel, c=c, use_last_bias and True or False)
        if False else
        functools.partial(_back_kernel, c=c, use_bias=use_last_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda ti, hi: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w7
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b7
            pl.BlockSpec((1, tile_h, w, c), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # beta
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda ti, hi: (ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), dtype),
    )(s, ca.astype(dtype),
      params['w7'].astype(dtype),
      params.get('b7', jnp.zeros((c,), dtype)).astype(dtype),
      x, params['beta'].astype(dtype))
    return out
