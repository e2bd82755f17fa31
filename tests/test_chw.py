"""Packed-CHW kernel equivalence vs the XLA modules (interpret mode).

The packed layout + kernels are the TPU inference fast path
(``shiftnet_tpu/ops/chw.py``); every kernel must match the layer-by-layer
XLA path exactly (same op order and f32 accumulation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shiftnet_tpu.models.layers import (
    CAB, DownSample, SkipUpSample, TFRUNet)
from shiftnet_tpu.ops import chw

CPU = jax.devices('cpu')[0]


def _err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.max(np.abs(a - b))
    return d, d / (np.max(np.abs(b)) + 1e-9)


@pytest.fixture(autouse=True)
def _on_cpu():
    prev = jax.config.jax_default_device
    jax.config.update('jax_default_device', CPU)
    yield
    jax.config.update('jax_default_device', prev)


@pytest.mark.parametrize('pf,shape', [
    (4, (2, 16, 96, 24)), (2, (2, 8, 24, 12)), (1, (2, 8, 24, 12)),
    (4, (1, 16, 512, 8)),
])
def test_roundtrip(pf, shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    rt = chw.to_nhwc(chw.from_nhwc(x, padr=2, pf=pf))
    assert _err(rt, x)[0] == 0


@pytest.mark.parametrize('pf,shape', [
    (4, (2, 16, 96, 24)), (2, (2, 16, 96, 12)), (1, (2, 4, 24, 16)),
    (4, (1, 16, 512, 8)),   # masked layout (gw % 128 == 0)
])
def test_cab(pf, shape):
    t, h, w, c = shape
    mod = CAB(c, kernel_size=3, reduction=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    ref = mod.apply({'params': params}, x)
    got = chw.to_nhwc(chw.cab_chw(chw.from_nhwc(x, padr=2, pf=pf), params,
                                  reduction=4, interpret=True))
    assert _err(got, ref)[1] < 1e-5


@pytest.mark.parametrize('prelu', [False, True])
def test_downsample(prelu):
    t, h, w, c, co = 2, 16, 96, 24, 36
    mod = DownSample(co, with_prelu=prelu, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, c), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    ref = mod.apply({'params': params}, x)
    got = chw.to_nhwc(chw.down_chw(chw.from_nhwc(x, padr=2, pf=4), params,
                                   co, with_prelu=prelu, interpret=True))
    assert _err(got, ref)[1] < 1e-5


@pytest.mark.parametrize('pf_in', [1, 2])
def test_up_skip(pf_in):
    t, h, w, ci, co = 2, 8, 48, 16, 12
    mod = SkipUpSample(co, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, ci), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(2), (t, 2 * h, 2 * w, co),
                             jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x, skip)['params']
    ref = mod.apply({'params': params}, x, skip)
    got = chw.to_nhwc(chw.up_skip_chw(
        chw.from_nhwc(x, padr=2, pf=pf_in), params,
        chw.from_nhwc(skip, padr=2, pf=2 * pf_in), interpret=True))
    assert _err(got, ref)[1] < 1e-5


def test_generic_conv_stride1_bias_prelu():
    t, h, w, ci, co = 2, 16, 96, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, ci), jnp.float32)
    kern = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co),
                                   jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
    alpha = jnp.asarray([0.25], jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
    ref = jnp.maximum(ref, 0) + 0.25 * jnp.minimum(ref, 0)
    got = chw.to_nhwc(chw.conv_chw(chw.from_nhwc(x, padr=2, pf=4), kern,
                                   bias, alpha, interpret=True))
    assert _err(got, ref)[1] < 1e-5


def test_generic_conv_k2_stride2():
    # down01: k=2 s=2 pad=0 (gshift_deblur1.py:560-562)
    t, h, w, ci, co = 2, 16, 96, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, ci), jnp.float32)
    kern = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (2, 2, ci, co),
                                   jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kern, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = chw.to_nhwc(chw.conv_chw(chw.from_nhwc(x, padr=2, pf=4), kern,
                                   None, None, stride=2, interpret=True))
    assert _err(got, ref)[1] < 1e-5


def test_concat_and_pixel_shuffle():
    t, h, w = 2, 8, 48
    a = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, 12), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (t, h, w, 8), jnp.float32)
    cat = chw.concat_chw([chw.from_nhwc(a, padr=2, pf=2),
                          chw.from_nhwc(b, padr=2, pf=2)])
    assert _err(chw.to_nhwc(cat), jnp.concatenate([a, b], -1))[0] == 0

    from shiftnet_tpu.ops.resize import pixel_shuffle
    y = jax.random.normal(jax.random.PRNGKey(2), (t, h, w, 16), jnp.float32)
    ref = pixel_shuffle(y, 2)
    got = chw.to_nhwc(chw.pixel_shuffle_chw(chw.from_nhwc(y, padr=2, pf=2),
                                            2))
    assert _err(got, ref)[0] == 0


def test_tfr_unet():
    t, h, w, c0 = 2, 16, 96, 8
    mod = TFRUNet(c0, kernel_size=3, reduction=4, scale_unetfeats=4,
                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, c0), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    ref = mod.apply({'params': params}, x)
    got = chw.to_nhwc(chw.tfr_unet_chw(params, chw.from_nhwc(x, padr=2,
                                                             pf=4),
                                       reduction=4, interpret=True))
    assert _err(got, ref)[1] < 1e-5
