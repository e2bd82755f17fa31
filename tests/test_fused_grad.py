"""Training gradients through the fused (packed-CHW Pallas) path.

The fused ops carry custom VJPs (``ops/chw_grad.py``): forward = Pallas
kernel, backward = XLA autodiff of the packed-layout equivalent.  These
tests assert, on CPU in f32, that d(loss)/d(params) through the
``fused_chw=True`` model matches the unfused XLA path — the reference
trains the exact ops it infers with
(``image_restoration_model.py:255-284``); this locks the same property.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shiftnet_tpu.models import CONFIGS, build_model

CPU = jax.devices('cpu')[0]


@pytest.fixture(autouse=True)
def _on_cpu():
    prev = jax.config.jax_default_device
    jax.config.update('jax_default_device', CPU)
    yield
    jax.config.update('jax_default_device', prev)


SMALL_KW = dict(num_orbs=1, shift_rounds=2)


def _scaled_random(params, seed):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(flat))
    leaves = []
    for k, (path, leaf) in zip(keys, flat):
        name = path[-1].key
        if leaf.ndim == 4:
            fan_in = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
            v = 0.3 / np.sqrt(fan_in) * jax.random.normal(k, leaf.shape)
        elif name == 'beta':
            v = 0.1 * jax.random.normal(k, leaf.shape)
        elif name == 'weight' and leaf.ndim <= 1:
            v = 1.0 + 0.1 * jax.random.normal(k, leaf.shape)
        else:
            v = 0.1 * jax.random.normal(k, leaf.shape)
        leaves.append(v.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize('name', ['deblur_plus', 'denoise_small'])
def test_fused_grads_match_unfused(name):
    cfg = CONFIGS[name].replace(**SMALL_KW)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 64, 3),
                          jnp.float32)
    nm = (0.1 * jnp.ones((3, 16, 64, 1), jnp.float32)
          if cfg.in_channels == 4 else None)
    gt = jax.random.normal(jax.random.PRNGKey(9),
                           (3 - cfg.past_frames - cfg.future_frames,
                            16, 64, 3), jnp.float32)

    fused = build_model(name, fused_chw=True, **SMALL_KW)
    unfused = build_model(name, **SMALL_KW)
    init = jax.jit(lambda r: fused.init(r, x, nm) if nm is not None
                   else fused.init(r, x))
    params = _scaled_random(init(jax.random.PRNGKey(1))['params'], 7)

    def loss(model, p):
        out = (model.apply({'params': p}, x, nm) if nm is not None
               else model.apply({'params': p}, x))
        return jnp.mean(jnp.abs(out.astype(jnp.float32) - gt))

    lf, gf = jax.jit(jax.value_and_grad(
        lambda p: loss(fused, p)))(params)
    lu, gu = jax.jit(jax.value_and_grad(
        lambda p: loss(unfused, p)))(params)

    assert abs(float(lf) - float(lu)) < 1e-5 * max(1.0, abs(float(lu)))

    flat_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    flat_u = dict(jax.tree_util.tree_flatten_with_path(gu)[0])
    worst = 0.0
    for path, leaf in flat_f:
        ref = flat_u[path]
        scale = float(jnp.max(jnp.abs(ref))) + 1e-8
        err = float(jnp.max(jnp.abs(leaf - ref))) / scale
        worst = max(worst, err)
        assert err < 2e-3, (jax.tree_util.keystr(path), err)
    assert worst < 2e-3
