"""Differentiable wrappers for the fused packed-CHW ops (training path).

Each wrapper is a ``jax.custom_vjp``: the forward runs the Pallas kernel
(``ops/chw.py`` / ``ops/naf_chw.py``), the backward runs ``jax.vjp`` of
the matching pure-XLA packed-layout equivalent (``ops/chw_xla.py``,
rematerialized from the saved inputs).  That keeps training on the dense
packed layout end-to-end: the forward gets the kernel speed, the backward
gets XLA autodiff of tap-stacked MXU contractions over dense HBM arrays
(no NHWC 128-lane channel padding).

The reference trains the exact ops it infers with
(``basicsr/models/image_restoration_model.py:255-284``); these wrappers
close the same gap for the fused path.  Equivalence kernel<->XLA body is
asserted by ``tests/test_chw_xla.py``; fused-vs-unfused gradients by
``tests/test_fused_grad.py``.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from shiftnet_tpu.ops import chw, chw_xla, naf_chw


# -- generic conv -----------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _conv_core(x, kern, bias, alpha, stride, use_bias, use_prelu):
    return chw.conv_chw(x, kern, bias if use_bias else None,
                        alpha if use_prelu else None, stride=stride)


def _conv_fwd(x, kern, bias, alpha, stride, use_bias, use_prelu):
    out = _conv_core(x, kern, bias, alpha, stride, use_bias, use_prelu)
    return out, (x, kern, bias, alpha)


def _conv_bwd(stride, use_bias, use_prelu, res, ct):
    x, kern, bias, alpha = res

    def f(x, kern, bias, alpha):
        return chw_xla.conv_chw_xla(x, kern, bias if use_bias else None,
                                    alpha if use_prelu else None,
                                    stride=stride)

    _, vjp = jax.vjp(f, x, kern, bias, alpha)
    return vjp(ct)


_conv_core.defvjp(_conv_fwd, _conv_bwd)


def conv_chw_d(x: chw.ChwTensor, kern, bias, alpha, *,
               stride: int = 1) -> chw.ChwTensor:
    c_out = kern.shape[3]
    b = bias if bias is not None else jnp.zeros((c_out,), kern.dtype)
    a = alpha if alpha is not None else jnp.zeros((1,), kern.dtype)
    return _conv_core(x, kern, b, a, stride, bias is not None,
                      alpha is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _conv_cat_core(xs, kerns, bias, alpha, use_bias, use_prelu):
    return chw.conv_concat_chw(list(xs), list(kerns),
                               bias if use_bias else None,
                               alpha if use_prelu else None)


def _conv_cat_fwd(xs, kerns, bias, alpha, use_bias, use_prelu):
    out = _conv_cat_core(xs, kerns, bias, alpha, use_bias, use_prelu)
    return out, (xs, kerns, bias, alpha)


def _conv_cat_bwd(use_bias, use_prelu, res, ct):
    xs, kerns, bias, alpha = res

    def f(xs, kerns, bias, alpha):
        return chw_xla.conv_concat_chw_xla(
            list(xs), list(kerns), bias if use_bias else None,
            alpha if use_prelu else None)

    _, vjp = jax.vjp(f, xs, kerns, bias, alpha)
    return vjp(ct)


_conv_cat_core.defvjp(_conv_cat_fwd, _conv_cat_bwd)


def conv_concat_chw_d(xs: list[chw.ChwTensor], kerns: list, bias,
                      alpha) -> chw.ChwTensor:
    """Differentiable ``conv(concat(xs))`` without the materialized concat
    (``chw.conv_concat_chw``); XLA backward via the accumulated tap-dot
    equivalent."""
    c_out = kerns[0].shape[3]
    b = bias if bias is not None else jnp.zeros((c_out,), kerns[0].dtype)
    a = alpha if alpha is not None else jnp.zeros((1,), kerns[0].dtype)
    return _conv_cat_core(tuple(xs), tuple(kerns), b, a,
                          bias is not None, alpha is not None)


def down_chw_d(x: chw.ChwTensor, params: dict[str, Any], c_out: int, *,
               with_prelu: bool = False) -> chw.ChwTensor:
    if with_prelu:
        return conv_chw_d(x, params['down__0']['conv']['kernel'], None,
                          params['down__1']['weight'], stride=2)
    return conv_chw_d(x, params['down']['conv']['kernel'],
                      params['down']['conv']['bias'], None, stride=2)


# -- plain CAB --------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cab_chw_d(x, params, reduction):
    return chw.cab_chw(x, params, reduction=reduction)


def _cab_fwd(x, params, reduction):
    return cab_chw_d(x, params, reduction), (x, params)


def _cab_bwd(reduction, res, ct):
    x, params = res
    _, vjp = jax.vjp(
        lambda x, p: chw_xla.cab_chw_xla(x, p, reduction=reduction),
        x, params)
    return vjp(ct)


cab_chw_d.defvjp(_cab_fwd, _cab_bwd)


# -- SkipUpSample -----------------------------------------------------------


@jax.custom_vjp
def up_skip_chw_d(x, params, skip):
    return chw.up_skip_chw(x, params, skip)


def _up_fwd(x, params, skip):
    return up_skip_chw_d(x, params, skip), (x, params, skip)


def _up_bwd(res, ct):
    _, vjp = jax.vjp(chw_xla.up_skip_chw_xla, *res)
    return vjp(ct)


up_skip_chw_d.defvjp(_up_fwd, _up_bwd)


# -- fused shift round (temporal y + spatial hw) ----------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def shift_round_chw_d(x, add_c, number, reverse, boundary_patch):
    return naf_chw.shift_round_chw(x, add_c, number, reverse=reverse,
                                   boundary_patch=boundary_patch)


def _shift_round_fwd(x, add_c, number, reverse, boundary_patch):
    out = shift_round_chw_d(x, add_c, number, reverse, boundary_patch)
    return out, x


def _shift_round_bwd(add_c, number, reverse, boundary_patch, x, ct):
    def f(x):
        y = naf_chw.temporal_shift_chw(x, reverse=reverse,
                                       boundary_patch=boundary_patch)
        return y, naf_chw.gsts_hw_chw(y, add_c, number, reverse=reverse)

    _, vjp = jax.vjp(f, x)
    return vjp(ct)


shift_round_chw_d.defvjp(_shift_round_fwd, _shift_round_bwd)


# -- NAF CAB1/CAB2 ----------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def naf_cab_chw_d(y, hw, params, groups, mid_ca, use_last_bias):
    return naf_chw.naf_cab_chw(y, hw, params, groups=groups, mid_ca=mid_ca,
                               use_last_bias=use_last_bias)


def _naf_fwd(y, hw, params, groups, mid_ca, use_last_bias):
    out = naf_cab_chw_d(y, hw, params, groups, mid_ca, use_last_bias)
    return out, (y, hw, params)


def _naf_bwd(groups, mid_ca, use_last_bias, res, ct):
    y, hw, params = res
    _, vjp = jax.vjp(
        lambda y, hw, p: chw_xla.naf_cab_chw_xla(
            y, hw, p, groups=groups, mid_ca=mid_ca,
            use_last_bias=use_last_bias),
        y, hw, params)
    return vjp(ct)


naf_cab_chw_d.defvjp(_naf_fwd, _naf_bwd)


# -- TFR U-Net on the packed layout, differentiable -------------------------


def tfr_unet_chw_d(params: dict[str, Any], x: chw.ChwTensor, *,
                   reduction: int,
                   downsample_prelu: bool = False) -> chw.ChwTensor:
    """``chw.tfr_unet_chw`` with every op routed through its custom-VJP
    wrapper (identical forward; differentiable)."""
    kw = dict(reduction=reduction)
    dkern = 'down__0' if downsample_prelu else 'down'
    c1 = params['down12'][dkern]['conv']['kernel'].shape[-1]
    c2 = params['down23'][dkern]['conv']['kernel'].shape[-1]

    enc1 = cab_chw_d(x, params['encoder_level1__0'], reduction)
    y = down_chw_d(enc1, params['down12'], c1,
                   with_prelu=downsample_prelu)
    for i in range(3):
        y = cab_chw_d(y, params[f'encoder_level2__{i}'], reduction)
    enc2 = y
    y = down_chw_d(enc2, params['down23'], c2, with_prelu=downsample_prelu)
    for i in range(3):
        y = cab_chw_d(y, params[f'encoder_level3__{i}'], reduction)
    for i in range(3):
        y = cab_chw_d(y, params[f'decoder_level3__{i}'], reduction)
    skip2 = cab_chw_d(enc2, params['skip_attn2'], reduction)
    y = up_skip_chw_d(y, params['up32'], skip2)
    for i in range(3):
        y = cab_chw_d(y, params[f'decoder_level2__{i}'], reduction)
    skip1 = cab_chw_d(enc1, params['skip_attn1'], reduction)
    y = up_skip_chw_d(y, params['up21'], skip1)
    return cab_chw_d(y, params['decoder_level1__0'], reduction)
