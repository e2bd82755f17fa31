"""Channel LayerNorm for NHWC feature maps.

Parity with reference ``LayerNorm2d`` (``basicsr/models/archs/
gshift_deblur1.py:17-53``): per-pixel normalization over the channel axis with
biased variance and ``eps`` inside the sqrt.  The reference hand-writes the
backward; under XLA, autodiff of this expression produces the same fused
kernels, so no custom VJP is needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm_2d(x: jax.Array, weight: jax.Array, bias: jax.Array,
                  eps: float = 1e-6) -> jax.Array:
    """Normalize ``(..., C)`` over the channel axis.

    Statistics are computed in float32 regardless of input dtype (matters for
    bf16 activations) and the result is cast back to the input dtype.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
