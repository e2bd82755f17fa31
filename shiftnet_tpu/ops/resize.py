"""Resampling ops with PyTorch-matching semantics, NHWC layout.

- ``bilinear_up2x``: matches ``nn.Upsample(scale_factor=2, mode='bilinear',
  align_corners=False)`` (reference ``gshift_deblur1.py:341-361``).
- ``pixel_shuffle``: matches ``F.pixel_shuffle`` (reference
  ``PixelShufflePack``, ``gshift_deblur1.py:256-278``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def bilinear_up2x(x: jax.Array) -> jax.Array:
    """2x bilinear upsample with half-pixel centers (align_corners=False).

    For integer scale 2 the torch kernel reduces to fixed 1/4-3/4 weights,
    which is exactly what a transposed depthwise conv — or jax.image.resize
    with 'linear' — computes.  We use an explicit pad+blend formulation so XLA
    lowers it to cheap strided ops instead of a general gather.

    x: (T, H, W, C) -> (T, 2H, 2W, C).
    """
    # Output pixel 2i   samples input at i - 0.25 -> 0.75*in[i] + 0.25*in[i-1]
    # Output pixel 2i+1 samples input at i + 0.25 -> 0.75*in[i] + 0.25*in[i+1]
    # with edge clamping.
    def up_axis(v: jax.Array, axis: int) -> jax.Array:
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
             jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)], axis=axis)
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis=axis)
        even = 0.75 * v + 0.25 * lo
        odd = 0.75 * v + 0.25 * hi
        # Interleave even/odd along `axis`.
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = 2 * v.shape[axis]
        return stacked.reshape(new_shape)

    dtype = x.dtype
    y = up_axis(x.astype(jnp.float32), 1)
    y = up_axis(y, 2)
    return y.astype(dtype)


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """Depth-to-space with torch channel ordering.

    torch: out[c, h*r+i, w*r+j] = in[c*r*r + i*r + j, h, w].
    x: (T, H, W, C*r*r) -> (T, H*r, W*r, C).
    """
    return rearrange(x, 't h w (c i j) -> t (h i) (w j) c', i=scale, j=scale)
