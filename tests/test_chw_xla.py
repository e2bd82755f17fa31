"""XLA (jnp) packed-layout equivalents vs the Pallas kernels.

``ops/chw_xla.py`` is the backward body of the fused ops' custom VJPs —
its forward must match the kernels (same op order / f32 accumulation), or
training gradients would correspond to a different function than the
inference forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shiftnet_tpu.models.layers import CAB, CAB1, CAB2, SkipUpSample
from shiftnet_tpu.ops import chw, chw_xla, naf_chw
from shiftnet_tpu.ops.shift import gsts

CPU = jax.devices('cpu')[0]


def _err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)


@pytest.fixture(autouse=True)
def _on_cpu():
    prev = jax.config.jax_default_device
    jax.config.update('jax_default_device', CPU)
    yield
    jax.config.update('jax_default_device', prev)


def _rand(params, seed):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [0.15 * jax.random.normal(k, l.shape, l.dtype)
                  for k, l in zip(keys, leaves)])


@pytest.mark.parametrize('pf,stride', [(2, 1), (4, 2), (1, 1)])
def test_conv_xla(pf, stride):
    t, h, w, c, co = 2, 16, 96, 12, 20
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, c), jnp.float32)
    kern = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, co))
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (co,))
    alpha = jnp.asarray([0.3])
    xc = chw.from_nhwc(x, padr=2, pf=pf)
    ker = chw.conv_chw(xc, kern, bias, alpha, stride=stride,
                       interpret=True)
    xla = chw_xla.conv_chw_xla(xc, kern, bias, alpha, stride=stride)
    assert xla.data.shape == ker.data.shape
    assert _err(xla.data, ker.data) < 1e-6
    assert _err(chw.to_nhwc(xla), chw.to_nhwc(ker)) < 1e-6


@pytest.mark.parametrize('pf', [1, 4])
def test_cab_xla(pf):
    t, h, w, c = 2, 16, 96, 16
    mod = CAB(c, kernel_size=3, reduction=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, c), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    xc = chw.from_nhwc(x, padr=2, pf=pf)
    ker = chw.cab_chw(xc, params, reduction=4, interpret=True)
    xla = chw_xla.cab_chw_xla(xc, params, reduction=4)
    assert _err(xla.data, ker.data) < 1e-6


@pytest.mark.parametrize('pf_in', [1, 2])
def test_up_skip_xla(pf_in):
    t, h, w, ci, co = 2, 8, 48, 16, 12
    mod = SkipUpSample(co, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, ci), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(2), (t, 2 * h, 2 * w, co),
                             jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x, skip)['params']
    xc = chw.from_nhwc(x, padr=2, pf=pf_in)
    sc = chw.from_nhwc(skip, padr=2, pf=2 * pf_in)
    ker = chw.up_skip_chw(xc, params, sc, interpret=True)
    xla = chw_xla.up_skip_chw_xla(xc, params, sc)
    assert _err(xla.data, ker.data) < 1e-6


@pytest.mark.parametrize('pf', [1, 2])
@pytest.mark.parametrize('mid_ca,last_bias', [(False, False), (True, True)])
def test_naf_cab_xla(pf, mid_ca, last_bias):
    t, h, w, n = 2, 16, 96, 32
    number = n // 2 // 8
    add_c = 8 * number
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, n), jnp.float32)
    xc = chw.from_nhwc(x, padr=4, pf=pf)
    kw = dict(kernel_size=5, reduction=4, mid_ca=mid_ca,
              last_bias=last_bias, dtype=jnp.float32)

    # CAB1
    mod1 = CAB1(n, **kw)
    p1 = _rand(mod1.init(jax.random.PRNGKey(1), x)['params'], 11)
    naf1 = naf_chw.naf_params_from_tree(p1, mid_ca=mid_ca,
                                        last_bias=last_bias)
    ker = naf_chw.naf_cab_chw(xc, None, naf1, groups=n // 8, mid_ca=mid_ca,
                              use_last_bias=last_bias, interpret=True)
    xla = chw_xla.naf_cab_chw_xla(xc, None, naf1, groups=n // 8,
                                  mid_ca=mid_ca, use_last_bias=last_bias)
    assert _err(xla.data, ker.data) < 1e-5

    # CAB2 (with the shifted hw input; conv1 applied inside both)
    full = gsts(x, number, reverse=False, boundary_patch=True)
    mod2 = CAB2(n, add_c, **kw)
    p2 = _rand(mod2.init(jax.random.PRNGKey(2), full)['params'], 12)
    naf2 = naf_chw.naf_params_from_tree(p2, mid_ca=mid_ca,
                                        last_bias=last_bias, add_c=add_c)
    yc = naf_chw.temporal_shift_chw(xc, reverse=False, boundary_patch=True)
    hwc = naf_chw.gsts_hw_chw(yc, add_c, number, reverse=False)
    ker2 = naf_chw.naf_cab_chw(yc, hwc, naf2, groups=n // 8, mid_ca=mid_ca,
                               use_last_bias=last_bias, interpret=True)
    xla2 = chw_xla.naf_cab_chw_xla(yc, hwc, naf2, groups=n // 8,
                                   mid_ca=mid_ca, use_last_bias=last_bias)
    assert _err(xla2.data, ker2.data) < 1e-5


@pytest.mark.parametrize('n_in,pf,prelu', [(2, 4, False), (3, 2, True)])
def test_conv_concat_xla(n_in, pf, prelu):
    """Multi-input conv (``chw.conv_concat_chw``) == conv over the
    materialized concat, for the kernel AND its XLA backward body, values
    and gradients (the stage2 rconcat / Encoder2 conv_hr0 fusion —
    ``models/gshift.py _forward_chw``)."""
    t, h, w, c = 3, 16, 64, 24
    rng = np.random.default_rng(0)
    xs = [chw.from_nhwc(jnp.asarray(rng.standard_normal((t, h, w, c)),
                                    jnp.float32), padr=4, pf=pf)
          for _ in range(n_in)]
    ks = [jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)
          for _ in range(n_in)]
    b = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    al = jnp.asarray([0.25], jnp.float32) if prelu else None

    ref = chw.conv_chw(chw.concat_chw(xs), jnp.concatenate(ks, axis=2),
                       b, al, interpret=True)
    got = chw.conv_concat_chw(xs, ks, b, al, interpret=True)
    gx = chw_xla.conv_concat_chw_xla(xs, ks, b, al)
    assert got.c == ref.c and got.data.shape == ref.data.shape
    assert _err(got.data, ref.data) < 1e-5
    assert _err(gx.data, ref.data) < 1e-5

    from shiftnet_tpu.ops import chw_grad

    def loss_cat(xs_d, ks, b, al):
        xs2 = [chw.ChwTensor(d, h, w, 4, pf, c) for d in xs_d]
        o = chw_grad.conv_chw_d(chw.concat_chw(xs2),
                                jnp.concatenate(ks, axis=2), b, al)
        return jnp.sum(jnp.abs(o.data))

    def loss_new(xs_d, ks, b, al):
        xs2 = [chw.ChwTensor(d, h, w, 4, pf, c) for d in xs_d]
        return jnp.sum(jnp.abs(
            chw_grad.conv_concat_chw_d(xs2, ks, b, al).data))

    args = ([x.data for x in xs], ks, b, al)
    ga = jax.grad(loss_cat, argnums=(0, 1, 2))(*args)
    gb = jax.grad(loss_new, argnums=(0, 1, 2))(*args)
    scale = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(ga))
    err = max(float(jnp.max(jnp.abs(a - b2))) for a, b2 in
              zip(jax.tree.leaves(ga), jax.tree.leaves(gb)))
    assert err / scale < 1e-5, (err, scale)
