"""Fused Pallas CAB path == layer-by-layer XLA path (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shiftnet_tpu.models.layers import CAB1, CAB2, EncoderShiftBlock

CPU0 = jax.devices('cpu')[0]


def _randomize(params, seed=2, scale=0.1):
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    return jax.tree.unflatten(tree, leaves)


def setup_function(_):
    jax.config.update('jax_default_device', CPU0)


def teardown_function(_):
    jax.config.update('jax_default_device', None)


def test_cab1_fused_matches():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 16)), jnp.float32)
    ref = CAB1(16, kernel_size=5, reduction=4, fused=False)
    p = _randomize(ref.init(jax.random.PRNGKey(1), x))
    fused = CAB1(16, kernel_size=5, reduction=4, fused=True)
    assert (jax.tree.structure(p) ==
            jax.tree.structure(fused.init(jax.random.PRNGKey(1), x)))
    want = ref.apply(p, x)
    got = fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_cab2_fused_matches():
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.standard_normal((2, 16, 24, 16)), jnp.float32)
    hw = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    ref = CAB2(16, 8, kernel_size=5, reduction=4, fused=False)
    p = _randomize(ref.init(jax.random.PRNGKey(1), y, hw))
    fused = CAB2(16, 8, kernel_size=5, reduction=4, fused=True)
    assert (jax.tree.structure(p) ==
            jax.tree.structure(fused.init(jax.random.PRNGKey(1), y, hw)))
    want = ref.apply(p, y, hw)
    got = fused.apply(p, y, hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_shift_block_fused_matches():
    """Two full GSTS rounds (fwd CAB2+CAB1, rev CAB2+CAB1) with boundary
    patching — the integration the bench/eval path runs."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 16)), jnp.float32)
    ref = EncoderShiftBlock(16, rounds=2, fused=False)
    p = _randomize(ref.init(jax.random.PRNGKey(1), x))
    fused = EncoderShiftBlock(16, rounds=2, fused=True)
    want = ref.apply(p, x)
    got = fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_depthwise_repconv_variant():
    """Small-variant RepConv (fully depthwise groups=C) through the fused
    block-diagonal path."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)), jnp.float32)
    ref = CAB1(16, kernel_size=5, reduction=1, repconv_depthwise=True,
               fused=False)
    p = _randomize(ref.init(jax.random.PRNGKey(1), x))
    fused = CAB1(16, kernel_size=5, reduction=1, repconv_depthwise=True,
                 fused=True)
    want = ref.apply(p, x)
    got = fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_mid_ca_denoise_variant():
    """Denoise-variant CAB (mid CALayer2, biased projection) fused vs XLA."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 16)), jnp.float32)
    kw = dict(kernel_size=5, reduction=4, mid_ca=True, last_bias=True)
    ref = CAB1(16, fused=False, **kw)
    p = _randomize(ref.init(jax.random.PRNGKey(1), x))
    fused = CAB1(16, fused=True, **kw)
    assert (jax.tree.structure(p) ==
            jax.tree.structure(fused.init(jax.random.PRNGKey(1), x)))
    want = ref.apply(p, x)
    got = fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_mid_ca_shift_block():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 16)), jnp.float32)
    kw = dict(rounds=2, mid_ca=True, last_bias=True)
    ref = EncoderShiftBlock(16, fused=False, **kw)
    p = _randomize(ref.init(jax.random.PRNGKey(1), x))
    want = ref.apply(p, x)
    got = EncoderShiftBlock(16, fused=True, **kw).apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)
