"""Building blocks for GShiftNet, flax.linen, NHWC.

Every module mirrors a reference block (cited per class) with torch-matching
numerics and torch-default initialization.  Submodule names follow the torch
attribute paths with ``.`` -> ``_`` (Sequential indices included), so the
torch->JAX checkpoint converter in ``shiftnet_tpu/tools/convert_torch.py`` is a
mechanical key rewrite.

Layout: frames-as-batch NHWC ``(T, H, W, C)``.  Params are fp32; compute dtype
(typically bf16 on TPU) is configurable per model.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from shiftnet_tpu.ops.norm import layer_norm_2d
from shiftnet_tpu.ops.resize import bilinear_up2x, pixel_shuffle
from shiftnet_tpu.ops.shift import gsts, temporal_channel_shift

Dtype = Any


def cast_tree(tree, dtype):
    """Cast a param subtree to the module's compute dtype — the fused-path
    analog of flax's ``nn.Conv(dtype=...)`` input/kernel promotion.  Without
    it, fp32 training params would silently promote the whole fused forward
    (and its VJP) to f32 (2x HBM, slower MXU)."""
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)


def _torch_conv_kernel_init(key, shape, dtype):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax HWIO kernel shape: (kh, kw, in_ch/groups, out_ch).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_conv_bias_init_factory(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """2D conv with torch-style explicit padding and default init.

    Matches ``conv()`` / raw ``nn.Conv2d`` uses in the reference
    (``gshift_deblur1.py:135-138``).
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: int | None = None  # default k//2 (torch 'conv' helper)
    use_bias: bool = False
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2 if self.padding is None else self.padding
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k * k
        # Grouped convs with 1 < G < C (RepConv's groups=C/8) are pathological
        # on TPU: XLA picks batch-on-lanes layouts (observed 8x padded relayout
        # buffers) and runs far below the MXU dense rate.  On the MXU a
        # block-diagonal *dense* kernel has the same systolic cost as its
        # enclosing dense shape, and XLA maps dense convs well — so lower
        # grouped to dense with a scattered block-diagonal kernel.  Parameters
        # keep the grouped (kh, kw, Cin/G, Cout) shape (converter-compatible).
        if 1 < self.groups < self.features:
            return _DenseGroupedConv(
                features=self.features, kernel_size=k, stride=self.stride,
                pad=pad, groups=self.groups, use_bias=self.use_bias,
                dtype=self.dtype, name='conv')(x)
        y = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_torch_conv_kernel_init,
            bias_init=_torch_conv_bias_init_factory(fan_in),
            name='conv',
        )(x)
        return y


class _DenseGroupedConv(nn.Module):
    """Grouped conv executed as a dense conv with a block-diagonal kernel.

    Parameters keep the grouped (kh, kw, Cin/G, Cout) shape so checkpoints and
    the torch converter are unaffected; the dense scatter happens at apply
    time and folds into XLA constants/fusions.
    """
    features: int
    kernel_size: int
    stride: int
    pad: int
    groups: int
    use_bias: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        cing = in_ch // self.groups
        per_out = self.features // self.groups
        kernel = self.param('kernel', _torch_conv_kernel_init,
                            (k, k, cing, self.features), jnp.float32)
        dense = jnp.zeros((k, k, in_ch, self.features), self.dtype)
        for g in range(self.groups):
            dense = dense.at[
                :, :, g * cing:(g + 1) * cing,
                g * per_out:(g + 1) * per_out].set(
                kernel[..., g * per_out:(g + 1) * per_out].astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), dense,
            window_strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param(
                'bias', _torch_conv_bias_init_factory(cing * k * k),
                (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class PReLU(nn.Module):
    """Single-parameter PReLU, torch init 0.25 (``nn.PReLU()``)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param('weight', lambda k, s: jnp.full(s, 0.25, jnp.float32),
                           (1,))
        a = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class LayerNorm2d(nn.Module):
    """Reference ``LayerNorm2d`` (``gshift_deblur1.py:17-53``), channel LN."""
    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param('weight', nn.initializers.ones, (self.channels,),
                            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        return layer_norm_2d(x, weight, bias, self.eps)


class CALayer(nn.Module):
    """SE-style channel attention (``gshift_deblur1.py:54-70``).

    ``reduction`` may be overridden to 1 by the small-deblur variant
    (``gshift_deblur2.py:60``).
    """
    channels: int
    reduction: int = 16
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Global average pool in fp32 for stable statistics.
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = y.astype(x.dtype)
        y = Conv2d(self.channels // self.reduction, 1, use_bias=self.use_bias,
                   dtype=self.dtype, name='conv_du__0')(y)
        y = nn.relu(y)
        y = Conv2d(self.channels, 1, use_bias=self.use_bias, dtype=self.dtype,
                   name='conv_du__2')(y)
        y = nn.sigmoid(y)
        return x * y


def simple_gate(x):
    """``SimpleGate`` (``gshift_deblur1.py:175-178``): x1 * x2."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


def simple_gate2(x):
    """``SimpleGate2`` (``gshift_deblur1.py:179-182``): x1 * sigmoid(x2)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * nn.sigmoid(x2)


class RepConv(nn.Module):
    """``RepConv`` (``gshift_deblur1.py:157-165``): kxk + 3x3 grouped convs +
    identity.  Small variants use fully-depthwise grouping
    (``gshift_deblur2.py:162-163``)."""
    channels: int
    kernel_size: int
    use_bias: bool = False
    depthwise: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        groups = self.channels if self.depthwise else self.channels // 8
        r1 = Conv2d(self.channels, self.kernel_size, use_bias=self.use_bias,
                    groups=groups, dtype=self.dtype, name='conv_1')(x)
        r2 = Conv2d(self.channels, 3, use_bias=self.use_bias, groups=groups,
                    dtype=self.dtype, name='conv_2')(x)
        return r1 + r2 + x


class RepConv2(nn.Module):
    """``RepConv2`` (``gshift_deblur1.py:166-174``): depthwise 3x3 + identity."""
    channels: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r2 = Conv2d(self.channels, 3, use_bias=self.use_bias,
                    groups=self.channels, dtype=self.dtype, name='conv_2')(x)
        return r2 + x


class CAB(nn.Module):
    """Plain channel-attention block (``gshift_deblur1.py:141-156``):
    conv-PReLU-conv + CA, residual."""
    n_feat: int
    kernel_size: int
    reduction: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from shiftnet_tpu.ops import chw
        if isinstance(x, chw.ChwTensor):
            assert self.kernel_size == 3 and not self.use_bias
            self._declare(x.c)
            params = cast_tree(self.variables['params'], self.dtype)
            from shiftnet_tpu.ops import chw_grad
            return chw_grad.cab_chw_d(x, params, self.reduction)
        res = Conv2d(self.n_feat, self.kernel_size, use_bias=self.use_bias,
                     dtype=self.dtype, name='body__0')(x)
        res = PReLU(dtype=self.dtype, name='body__1')(res)
        res = Conv2d(self.n_feat, self.kernel_size, use_bias=self.use_bias,
                     dtype=self.dtype, name='body__2')(res)
        res = CALayer(self.n_feat, self.reduction, use_bias=self.use_bias,
                      dtype=self.dtype, name='CA')(res)
        return res + x

    def _declare(self, c_in):
        z = jnp.zeros((1, 1, 1, c_in), self.dtype)
        r = Conv2d(self.n_feat, self.kernel_size, use_bias=self.use_bias,
                   dtype=self.dtype, name='body__0')(z)
        r = PReLU(dtype=self.dtype, name='body__1')(r)
        r = Conv2d(self.n_feat, self.kernel_size, use_bias=self.use_bias,
                   dtype=self.dtype, name='body__2')(r)
        CALayer(self.n_feat, self.reduction, use_bias=self.use_bias,
                dtype=self.dtype, name='CA')(r)


class ShiftCAB(nn.Module):
    """``Shift_CAB`` (``gshift_denoise1.py:157-186``): temporal half-channel
    shift (with boundary patch) followed by a plain CAB body, residual to the
    *shifted* input."""
    n_feat: int
    kernel_size: int
    reduction: int
    use_bias: bool = False
    reverse: bool = False
    time_axis: str | None = None  # mesh axis when T is shard_map-sharded
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from shiftnet_tpu.ops import chw, naf_chw
        if isinstance(x, chw.ChwTensor):
            assert self.kernel_size == 3 and not self.use_bias
            z = jnp.zeros((1, 1, 1, x.c), self.dtype)
            r = Conv2d(self.n_feat, self.kernel_size,
                       use_bias=self.use_bias, dtype=self.dtype,
                       name='body__0')(z)
            r = PReLU(dtype=self.dtype, name='body__1')(r)
            r = Conv2d(self.n_feat, self.kernel_size,
                       use_bias=self.use_bias, dtype=self.dtype,
                       name='body__2')(r)
            CALayer(self.n_feat, self.reduction, use_bias=self.use_bias,
                    dtype=self.dtype, name='CA')(r)
            params = cast_tree(self.variables['params'], self.dtype)
            y = naf_chw.temporal_shift_chw(x, reverse=self.reverse,
                                           boundary_patch=True,
                                           axis=self.time_axis)
            from shiftnet_tpu.ops import chw_grad
            return chw_grad.cab_chw_d(y, params, self.reduction)
        x = temporal_channel_shift(x, reverse=self.reverse, boundary_patch=True,
                                   axis=self.time_axis)
        res = Conv2d(self.n_feat, self.kernel_size, use_bias=self.use_bias,
                     dtype=self.dtype, name='body__0')(x)
        res = PReLU(dtype=self.dtype, name='body__1')(res)
        res = Conv2d(self.n_feat, self.kernel_size, use_bias=self.use_bias,
                     dtype=self.dtype, name='body__2')(res)
        res = CALayer(self.n_feat, self.reduction, use_bias=self.use_bias,
                      dtype=self.dtype, name='CA')(res)
        return res + x


def naf_body(x, *, n_feat: int, kernel_size: int, reduction: int,
             use_bias: bool = False, mid_ca: bool = False,
             last_bias: bool = False, repconv_depthwise: bool = False,
             dtype: Dtype = jnp.float32):
    """Shared NAFNet-style gated body of CAB1/CAB2
    (``gshift_deblur1.py:183-255``), called inside the owner's compact scope
    so submodules land at ``body.<torch Sequential index>``.

    Sequence (deblur): 1x1 expand x2 -> RepConv2 (dw 3x3) -> SimpleGate ->
    RepConv -> 1x1 expand x2 -> SimpleGate2 -> CALayer2 -> 1x1 project.
    Denoise variants insert an extra CALayer2 after SimpleGate and use a
    biased final projection (``gshift_denoise1.py:224-229``).
    """
    n = n_feat
    i = 0
    x = Conv2d(2 * n, 1, use_bias=use_bias, dtype=dtype,
               name=f'body__{i}')(x); i += 1
    x = RepConv2(2 * n, use_bias=use_bias, dtype=dtype,
                 name=f'body__{i}')(x); i += 1
    x = simple_gate(x); i += 1
    if mid_ca:
        x = CALayer(n, reduction, use_bias=use_bias, dtype=dtype,
                    name=f'body__{i}')(x); i += 1
    x = RepConv(n, kernel_size, use_bias=use_bias,
                depthwise=repconv_depthwise, dtype=dtype,
                name=f'body__{i}')(x); i += 1
    x = Conv2d(2 * n, 1, use_bias=use_bias, dtype=dtype,
               name=f'body__{i}')(x); i += 1
    x = simple_gate2(x); i += 1
    x = CALayer(n, reduction, use_bias=use_bias, dtype=dtype,
                name=f'body__{i}')(x); i += 1
    x = Conv2d(n, 1, use_bias=last_bias, dtype=dtype,
               name=f'body__{i}')(x)
    return x


class CAB1(nn.Module):
    """``CAB1`` (``gshift_deblur1.py:183-211``): LN -> gated body, residual
    scaled by learned beta."""
    n_feat: int
    kernel_size: int
    reduction: int
    use_bias: bool = False
    mid_ca: bool = False
    last_bias: bool = False
    repconv_depthwise: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        beta = self.param('beta', nn.initializers.zeros,
                          (1, 1, 1, self.n_feat), jnp.float32)
        y = LayerNorm2d(self.n_feat, name='norm')(x)
        y = naf_body(y, n_feat=self.n_feat, kernel_size=self.kernel_size,
                     reduction=self.reduction, use_bias=self.use_bias,
                     mid_ca=self.mid_ca, last_bias=self.last_bias,
                     repconv_depthwise=self.repconv_depthwise,
                     dtype=self.dtype)
        return x + y * beta.astype(x.dtype)


class CAB2(nn.Module):
    """``CAB2`` (``gshift_deblur1.py:212-255``): consumes the GSTS-augmented
    ``(n_feat + add_channel)`` tensor.  The extra (spatially shifted) channels
    go through a depthwise 3x3 (``conv1``), then LN over the concatenation and
    the gated body; residual only to the first ``n_feat`` channels.

    Accepts either the concatenated tensor or ``(y, hw)`` split (the fused
    path never materializes the concat)."""
    n_feat: int
    add_channel: int
    kernel_size: int
    reduction: int
    use_bias: bool = False
    mid_ca: bool = False
    last_bias: bool = False
    repconv_depthwise: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_input, hw_input=None):
        n = self.n_feat
        if hw_input is not None:
            x_input = jnp.concatenate([x_input, hw_input], axis=-1)
        beta = self.param('beta', nn.initializers.zeros, (1, 1, 1, n),
                          jnp.float32)
        shortcut, hw = x_input[..., :n], x_input[..., n:]
        hw = Conv2d(self.add_channel, 3, use_bias=self.use_bias,
                    groups=self.add_channel, dtype=self.dtype, name='conv1')(hw)
        y = jnp.concatenate([shortcut, hw], axis=-1)
        y = LayerNorm2d(n + self.add_channel, name='norm')(y)
        y = naf_body(y, n_feat=n, kernel_size=self.kernel_size,
                     reduction=self.reduction, use_bias=self.use_bias,
                     mid_ca=self.mid_ca, last_bias=self.last_bias,
                     repconv_depthwise=self.repconv_depthwise,
                     dtype=self.dtype)
        return shortcut + y * beta.astype(x_input.dtype)


class DownSample(nn.Module):
    """Stride-2 3x3 downsample (``gshift_deblur1.py:330-340``).  Denoise
    variants use bias=False + PReLU (``gshift_denoise1.py:361-362``)."""
    out_channels: int
    with_prelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from shiftnet_tpu.ops import chw
        if isinstance(x, chw.ChwTensor):
            self._declare(x.c)
            params = cast_tree(self.variables['params'], self.dtype)
            from shiftnet_tpu.ops import chw_grad
            return chw_grad.down_chw_d(x, params, self.out_channels,
                                       with_prelu=self.with_prelu)
        if self.with_prelu:
            x = Conv2d(self.out_channels, 3, stride=2, use_bias=False,
                       dtype=self.dtype, name='down__0')(x)
            x = PReLU(dtype=self.dtype, name='down__1')(x)
        else:
            x = Conv2d(self.out_channels, 3, stride=2, use_bias=True,
                       dtype=self.dtype, name='down')(x)
        return x

    def _declare(self, c_in):
        z = jnp.zeros((1, 2, 2, c_in), self.dtype)
        if self.with_prelu:
            r = Conv2d(self.out_channels, 3, stride=2, use_bias=False,
                       dtype=self.dtype, name='down__0')(z)
            PReLU(dtype=self.dtype, name='down__1')(r)
        else:
            Conv2d(self.out_channels, 3, stride=2, use_bias=True,
                   dtype=self.dtype, name='down')(z)


class SkipUpSample(nn.Module):
    """Bilinear 2x + 1x1 conv + skip add (``gshift_deblur1.py:341-351``)."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        from shiftnet_tpu.ops import chw
        if isinstance(x, chw.ChwTensor):
            z = jnp.zeros((1, 1, 1, x.c), self.dtype)
            Conv2d(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name='up__1')(z)
            params = cast_tree(self.variables['params'], self.dtype)
            from shiftnet_tpu.ops import chw_grad
            return chw_grad.up_skip_chw_d(x, params, skip)
        x = bilinear_up2x(x)
        x = Conv2d(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name='up__1')(x)
        return x + skip


class PixelShufflePack(nn.Module):
    """Conv to C*r^2 then depth-to-space (``gshift_deblur1.py:256-278``)."""
    out_channels: int
    scale: int = 2
    upsample_kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from shiftnet_tpu.ops import chw
        if isinstance(x, chw.ChwTensor):
            assert self.scale == 2
            z = jnp.zeros((1, 1, 1, x.c), self.dtype)
            Conv2d(self.out_channels * 4, self.upsample_kernel,
                   use_bias=True, dtype=self.dtype, name='upsample_conv')(z)
            p = self.variables['params']['upsample_conv']['conv']
            from shiftnet_tpu.ops import chw_grad
            y = chw_grad.conv_chw_d(x, jnp.asarray(p['kernel'], self.dtype),
                                    jnp.asarray(p['bias'], self.dtype), None,
                                    stride=1)
            return chw.pixel_shuffle_chw(y, 2)
        x = Conv2d(self.out_channels * self.scale ** 2, self.upsample_kernel,
                   use_bias=True, dtype=self.dtype, name='upsample_conv')(x)
        return pixel_shuffle(x, self.scale)


class TFRUNet(nn.Module):
    """``TFR_UNet`` (``gshift_deblur1.py:681-722``): tiny per-frame 3-level
    U-Net of plain CABs; purely spatial (no temporal mixing).

    Accepts either an NHWC array (layer-by-layer XLA path) or a packed
    ``ChwTensor`` (fused Pallas path, ``ops/chw.py``): the fused branch
    declares the identical parameter tree by tracing the XLA body on a
    dummy clip, then runs the packed-kernel pipeline on the raw params —
    both paths share one checkpoint/converter layout.
    """
    n_feat0: int
    kernel_size: int = 3
    reduction: int = 4
    scale_unetfeats: int = 12
    use_bias: bool = False
    downsample_prelu: bool = False  # denoise DownSample variant
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from shiftnet_tpu.ops import chw
        if isinstance(x, chw.ChwTensor):
            dummy = jnp.zeros((1, 4, 4, self.n_feat0), self.dtype)
            self._body(dummy)  # declare the full (torch-named) param tree
            params = cast_tree(self.variables['params'], self.dtype)
            from shiftnet_tpu.ops import chw_grad
            return chw_grad.tfr_unet_chw_d(
                params, x, reduction=self.reduction,
                downsample_prelu=self.downsample_prelu)
        return self._body(x)

    def _body(self, x):
        c0 = self.n_feat0
        c1 = c0 + self.scale_unetfeats
        c2 = c0 + 2 * self.scale_unetfeats
        kw = dict(kernel_size=self.kernel_size, reduction=self.reduction,
                  use_bias=self.use_bias, dtype=self.dtype)

        enc1 = CAB(c0, name='encoder_level1__0', **kw)(x)
        y = DownSample(c1, with_prelu=self.downsample_prelu,
                       dtype=self.dtype, name='down12')(enc1)
        for i in range(3):
            y = CAB(c1, name=f'encoder_level2__{i}', **kw)(y)
        enc2 = y
        y = DownSample(c2, with_prelu=self.downsample_prelu,
                       dtype=self.dtype, name='down23')(enc2)
        for i in range(3):
            y = CAB(c2, name=f'encoder_level3__{i}', **kw)(y)
        enc3 = y

        dec3 = enc3
        for i in range(3):
            dec3 = CAB(c2, name=f'decoder_level3__{i}', **kw)(dec3)
        skip2 = CAB(c1, name='skip_attn2', **kw)(enc2)
        y = SkipUpSample(c1, dtype=self.dtype, name='up32')(dec3, skip2)
        for i in range(3):
            y = CAB(c1, name=f'decoder_level2__{i}', **kw)(y)
        skip1 = CAB(c0, name='skip_attn1', **kw)(enc1)
        y = SkipUpSample(c0, dtype=self.dtype, name='up21')(y, skip1)
        y = CAB(c0, name='decoder_level1__0', **kw)(y)
        return y


class EncoderShiftBlock(nn.Module):
    """``Encoder_shift_block`` (``gshift_deblur1.py:440-547``): ``rounds``
    iterations of [GSTS(fwd|rev) -> CAB2 -> CAB1], alternating shift
    direction each round starting with forward."""
    n_feat: int
    rounds: int = 8
    reduction: int = 4
    use_bias: bool = False
    boundary_patch: bool = True
    mid_ca: bool = False
    last_bias: bool = False
    repconv_depthwise: bool = False
    time_axis: str | None = None  # mesh axis when T is shard_map-sharded
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from shiftnet_tpu.ops import chw, naf_chw
        from shiftnet_tpu.ops.shift import grouped_spatial_shift
        number = self.n_feat // 2 // 8
        add_c = 8 * number
        if isinstance(x, chw.ChwTensor):
            # packed-CHW fused path: declare the identical param tree via
            # dummy XLA-module calls, then run the naf_chw kernels.
            n = self.n_feat
            z1 = jnp.zeros((1, 1, 1, n), self.dtype)
            z2 = jnp.zeros((1, 1, 1, n + add_c), self.dtype)
            kwd = dict(kernel_size=5, reduction=self.reduction,
                       use_bias=self.use_bias, mid_ca=self.mid_ca,
                       last_bias=self.last_bias,
                       repconv_depthwise=self.repconv_depthwise,
                       dtype=self.dtype)
            for r in range(self.rounds):
                suffix = '' if r == 0 else f'_{r}'
                CAB2(n, add_c, name=f'encoder_level1{suffix}__0',
                     **kwd)(z2)
                CAB1(n, name=f'encoder_level1{suffix}__1', **kwd)(z1)
            v = cast_tree(self.variables['params'], self.dtype)
            cab_params = []
            for r in range(self.rounds):
                suffix = '' if r == 0 else f'_{r}'
                cab_params.append((
                    naf_chw.naf_params_from_tree(
                        v[f'encoder_level1{suffix}__0'], mid_ca=self.mid_ca,
                        last_bias=self.last_bias, add_c=add_c),
                    naf_chw.naf_params_from_tree(
                        v[f'encoder_level1{suffix}__1'], mid_ca=self.mid_ca,
                        last_bias=self.last_bias)))
            return naf_chw.encoder_shift_block_chw(
                cab_params, x, rounds=self.rounds,
                boundary_patch=self.boundary_patch, mid_ca=self.mid_ca,
                last_bias=self.last_bias,
                repconv_depthwise=self.repconv_depthwise,
                axis=self.time_axis)
        kw = dict(kernel_size=5, reduction=self.reduction,
                  use_bias=self.use_bias, mid_ca=self.mid_ca,
                  last_bias=self.last_bias,
                  repconv_depthwise=self.repconv_depthwise,
                  dtype=self.dtype)
        if self.is_initializing() or self.rounds % 2:
            # unrolled: declares the per-round (torch-named) param tree
            for r in range(self.rounds):
                suffix = '' if r == 0 else f'_{r}'
                reverse = (r % 2 == 1)
                y = temporal_channel_shift(x, reverse=reverse,
                                           boundary_patch=self.boundary_patch,
                                           axis=self.time_axis)
                hw = y[..., -add_c:] if reverse else y[..., :add_c]
                hw = grouped_spatial_shift(hw, number)
                x = CAB2(self.n_feat, add_c,
                         name=f'encoder_level1{suffix}__0', **kw)(y, hw)
                x = CAB1(self.n_feat, name=f'encoder_level1{suffix}__1',
                         **kw)(x)
            return x
        # apply: lax.scan over (forward, reverse) round pairs — one traced
        # round-pair body instead of ``rounds`` copies (the rounds are
        # shape-identical; weights ride a stacked scan operand).  The param
        # tree/naming is untouched (declared by the init path above).
        v = self.variables['params']
        cab2 = CAB2(self.n_feat, add_c, **kw)
        cab1 = CAB1(self.n_feat, **kw)

        def prm(r):
            sfx = '' if r == 0 else f'_{r}'
            return (v[f'encoder_level1{sfx}__0'],
                    v[f'encoder_level1{sfx}__1'])

        pairs = [(prm(2 * i), prm(2 * i + 1))
                 for i in range(self.rounds // 2)]
        stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *pairs)

        def one(x, p2p1, reverse):
            p2, p1 = p2p1
            y = temporal_channel_shift(x, reverse=reverse,
                                       boundary_patch=self.boundary_patch,
                                       axis=self.time_axis)
            hw = y[..., -add_c:] if reverse else y[..., :add_c]
            hw = grouped_spatial_shift(hw, number)
            x = cab2.apply({'params': p2}, y, hw)
            return cab1.apply({'params': p1}, x)

        @jax.checkpoint
        def body(carry, prm2):
            carry = one(carry, prm2[0], False)
            carry = one(carry, prm2[1], True)
            return carry, None

        x, _ = jax.lax.scan(body, x, stacked)
        return x
