"""Tile-picker fallback robustness on awkward extents (interpret mode).

``pick_tile`` / ``pick_tile_s2d`` / the inline ``th`` searches in
``conv_chw`` / ``naf_cab_chw`` fall back to the smallest dividing row tile
when no candidate fits the calibrated VMEM budget (``ops/chw.py`` /
``ops/naf_chw.py``).  These tests force the fallback branch — f32 (the small
budget cap) with tiny budgets and prime-ish grid heights whose only dividing
tile is 1-3 rows — and assert the kernels still agree with the XLA modules,
so a Mosaic-calibration change or a model extent outside the tuned sweet
spot degrades to slow-but-correct, never wrong.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shiftnet_tpu.models.layers import CAB, CAB1
from shiftnet_tpu.ops import chw, naf_chw

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


def test_pick_tile_fallback_paths():
    # generous budget: largest divider; starved budget: smallest divider
    assert chw.pick_tile(32, 128, 24, 24) == 32
    assert chw.pick_tile(32, 128, 24, 24, budget=1) == 1
    # prime height: only th=1 divides, regardless of budget
    assert chw.pick_tile(17, 128, 24, 24) == 1
    assert chw.pick_tile_s2d(17, 128, 4, 16, 24) == 1
    assert chw.pick_tile_s2d(16, 128, 4, 16, 24, budget=1) == 1


@pytest.mark.parametrize('h', [7, 10])   # gh=7: th=1 only; gh=10: th<=2
def test_cab_flat_awkward_height(h):
    t, w, c = 2, 96, 16
    mod = CAB(c, kernel_size=3, reduction=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, c), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    ref = mod.apply({'params': params}, x)
    got = chw.to_nhwc(chw.cab_chw(chw.from_nhwc(x, padr=2, pf=1), params,
                                  reduction=4, interpret=True))
    assert _err(got, ref) < 1e-5


def test_conv_awkward_grid_height():
    # pf=2, h=20 -> gh=10: dividing tiles {2, 1} only (from the candidate
    # list minus 10's non-divisors); stride 2 exercises the phase remap at
    # the fallback tile too.
    t, h, w, c, co = 2, 20, 64, 12, 20
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, c), jnp.float32)
    kern = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, co),
                                   jnp.float32)
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
    for stride in (1, 2):
        ref = jax.lax.conv_general_dilated(
            x, kern, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias
        got = chw.to_nhwc(chw.conv_chw(chw.from_nhwc(x, padr=2, pf=2), kern,
                                       bias, None, stride=stride,
                                       interpret=True))
        assert _err(got, ref) < 1e-5, stride


def test_naf_cab_awkward_grid_height():
    # pf=1 with h=10: th falls through to 2 (or smaller) for the shift-block
    # gate/rep/back chain.
    t, h, w, n = 2, 10, 96, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, n), jnp.float32)
    mod = CAB1(n, kernel_size=5, reduction=4, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    # randomize beta so the block is not a pure shortcut
    params = jax.tree.map(
        lambda l: l + 0.1 * jax.random.normal(jax.random.PRNGKey(3), l.shape),
        params)
    ref = mod.apply({'params': params}, x)
    naf = naf_chw.naf_params_from_tree(params)
    got = chw.to_nhwc(naf_chw.naf_cab_chw(
        chw.from_nhwc(x, padr=4, pf=1), None, naf, groups=n // 8,
        interpret=True))
    assert _err(got, ref) < 1e-4
