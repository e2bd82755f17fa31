"""Shift-block (CAB1/CAB2 + GSTS) packed-CHW kernel equivalence vs the XLA
modules (interpret mode) — the inference fast path for
``Encoder_shift_block`` (``gshift_deblur1.py:440-547``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shiftnet_tpu.models.layers import CAB1, CAB2, EncoderShiftBlock
from shiftnet_tpu.ops import chw, naf_chw
from shiftnet_tpu.ops.shift import (
    grouped_spatial_shift, gsts, temporal_channel_shift)

CPU = jax.devices('cpu')[0]
T, H, W, N = 3, 16, 96, 32
NUMBER = N // 2 // 8
ADD_C = 8 * NUMBER


@pytest.fixture(autouse=True)
def _on_cpu():
    prev = jax.config.jax_default_device
    jax.config.update('jax_default_device', CPU)
    yield
    jax.config.update('jax_default_device', prev)


def _err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.max(np.abs(a - b))
    return d, d / (np.max(np.abs(b)) + 1e-9)


def _randomize(params, seed):
    """Random params (incl. zero-init beta) at a scale that keeps the gated
    cascade bounded, so no path is trivially the identity."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [0.15 * jax.random.normal(k, l.shape, l.dtype)
              for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _x(w=W):
    return jax.random.normal(jax.random.PRNGKey(0), (T, H, w, N),
                             jnp.float32)


@pytest.mark.parametrize('pf', [1, 2])
@pytest.mark.parametrize('reverse', [False, True])
@pytest.mark.parametrize('bp', [False, True])
def test_temporal_shift(pf, reverse, bp):
    x = _x()
    ref = temporal_channel_shift(x, reverse=reverse, boundary_patch=bp)
    got = chw.to_nhwc(naf_chw.temporal_shift_chw(
        chw.from_nhwc(x, padr=4, pf=pf), reverse=reverse,
        boundary_patch=bp))
    assert _err(got, ref)[0] == 0


@pytest.mark.parametrize('pf', [1, 2])
# W=96: ample slack; W=122: slack (6) < max shift (8), wraps unless masked;
# W=128: lane-aligned (ws == gw), zero slack.
@pytest.mark.parametrize('w', [96, 122, 128])
def test_spatial_shift(pf, w):
    x = _x(w)
    ref = grouped_spatial_shift(x[..., :ADD_C], NUMBER)
    hw = naf_chw.extract_hw_chw(chw.from_nhwc(x, padr=4, pf=pf), ADD_C,
                                reverse=False)
    got = chw.to_nhwc(naf_chw.grouped_spatial_shift_chw(hw, NUMBER))
    assert _err(got, ref)[0] == 0


# W=96: ample slack; W=122: slack (6) < max shift (8), masked branch;
# W=128: lane-aligned (ws == gw), zero slack.
@pytest.mark.parametrize('pf,padr', [(1, 8), (2, 4)])
@pytest.mark.parametrize('w', [96, 122, 128])
@pytest.mark.parametrize('reverse', [False, True])
@pytest.mark.parametrize('bp', [False, True])
def test_shift_round_kernel(pf, padr, w, reverse, bp):
    """Fused Pallas shift-round kernel (HBM->HBM temporal copies + VMEM
    spatial assembly) == the XLA temporal_shift_chw + gsts_hw_chw pair."""
    x = _x(w)
    xc = chw.from_nhwc(x, padr=padr, pf=pf)
    assert naf_chw.shift_round_eligible(xc, ADD_C)
    yr = naf_chw.temporal_shift_chw(xc, reverse=reverse, boundary_patch=bp)
    hwr = naf_chw.gsts_hw_chw(yr, ADD_C, NUMBER, reverse=reverse)
    y, hw = naf_chw.shift_round_chw(xc, ADD_C, NUMBER, reverse=reverse,
                                    boundary_patch=bp, interpret=True)
    # full buffers (not just to_nhwc) so the zero-pad invariant is checked
    assert _err(y.data, yr.data)[0] == 0
    assert _err(hw.data, hwr.data)[0] == 0


def test_shift_round_fallback():
    """Ineligible layouts (padr < max shift at pf=1) take the XLA pair."""
    xc = chw.from_nhwc(_x(), padr=4, pf=1)
    assert not naf_chw.shift_round_eligible(xc, ADD_C)
    y, hw = naf_chw.shift_round_chw(xc, ADD_C, NUMBER, reverse=False,
                                    boundary_patch=True, interpret=True)
    yr = naf_chw.temporal_shift_chw(xc, reverse=False, boundary_patch=True)
    hwr = naf_chw.gsts_hw_chw(yr, ADD_C, NUMBER, reverse=False)
    assert _err(y.data, yr.data)[0] == 0
    assert _err(hw.data, hwr.data)[0] == 0


@pytest.mark.parametrize('pf', [1, 2])
@pytest.mark.parametrize('w', [96, 128])
def test_dw3x3(pf, w):
    """Depthwise 3x3 (CAB2 conv1) on packed layouts, incl. the zero-slack
    masked layout (edge taps must not wrap into the adjacent row)."""
    x = _x(w)
    k = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (3, 3, N))
    ref = jax.lax.conv_general_dilated(
        x, k.reshape(3, 3, 1, N), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=N)
    got = chw.to_nhwc(naf_chw.dw3x3_chw(chw.from_nhwc(x, padr=4, pf=pf), k))
    assert _err(got, ref)[1] < 1e-6


@pytest.mark.parametrize('pf', [1, 2])
def test_cab1(pf):
    x = _x()
    mod = CAB1(N, kernel_size=5, reduction=4, dtype=jnp.float32)
    p = _randomize(mod.init(jax.random.PRNGKey(1), x)['params'], 11)
    ref = mod.apply({'params': p}, x)
    naf = naf_chw.naf_params_from_tree(p)
    got = chw.to_nhwc(naf_chw.naf_cab_chw(
        chw.from_nhwc(x, padr=4, pf=pf), None, naf, groups=N // 8,
        interpret=True))
    assert _err(got, ref)[1] < 1e-5


@pytest.mark.parametrize('pf', [1, 2])
@pytest.mark.parametrize('reverse', [False, True])
def test_cab2(pf, reverse):
    x = _x()
    full = gsts(x, NUMBER, reverse=reverse, boundary_patch=True)
    mod = CAB2(N, ADD_C, kernel_size=5, reduction=4, dtype=jnp.float32)
    p = _randomize(mod.init(jax.random.PRNGKey(2), full)['params'], 12)
    ref = mod.apply({'params': p}, full)
    naf = naf_chw.naf_params_from_tree(p, add_c=ADD_C)
    xc = chw.from_nhwc(x, padr=4, pf=pf)
    yc = naf_chw.temporal_shift_chw(xc, reverse=reverse, boundary_patch=True)
    hwc = naf_chw.grouped_spatial_shift_chw(
        naf_chw.extract_hw_chw(yc, ADD_C, reverse=reverse), NUMBER)
    got = chw.to_nhwc(naf_chw.naf_cab_chw(yc, hwc, naf, groups=N // 8,
                                          interpret=True))
    assert _err(got, ref)[1] < 1e-5


def test_cab2_masked_layout():
    """Full CAB2 chain on a zero-slack (ws == gw) layout: exercises the
    masked branches of the gate/rep kernels and the dw3x3/spatial-shift
    column masks together."""
    x = _x(128)
    full = gsts(x, NUMBER, reverse=False, boundary_patch=True)
    mod = CAB2(N, ADD_C, kernel_size=5, reduction=4, dtype=jnp.float32)
    p = _randomize(mod.init(jax.random.PRNGKey(2), full)['params'], 12)
    ref = mod.apply({'params': p}, full)
    naf = naf_chw.naf_params_from_tree(p, add_c=ADD_C)
    xc = chw.from_nhwc(x, padr=4, pf=1)
    yc = naf_chw.temporal_shift_chw(xc, reverse=False, boundary_patch=True)
    hwc = naf_chw.grouped_spatial_shift_chw(
        naf_chw.extract_hw_chw(yc, ADD_C, reverse=False), NUMBER)
    got = chw.to_nhwc(naf_chw.naf_cab_chw(yc, hwc, naf, groups=N // 8,
                                          interpret=True))
    assert _err(got, ref)[1] < 1e-5


@pytest.mark.parametrize('pf', [1, 2])
def test_encoder_shift_block(pf):
    x = _x()
    mod = EncoderShiftBlock(N, rounds=2, reduction=4, dtype=jnp.float32)
    P = _randomize(mod.init(jax.random.PRNGKey(3), x)['params'], 13)
    ref = mod.apply({'params': P}, x)
    got = chw.to_nhwc(mod.apply({'params': P},
                                chw.from_nhwc(x, padr=4, pf=pf)))
    assert _err(got, ref)[1] < 3e-4
