"""CPU-interpret correctness checks for the CHW shift-block kernels."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
import jax  # noqa: E402

jax.config.update('jax_default_device', jax.devices('cpu')[0])
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from shiftnet_tpu.models.layers import CAB1, CAB2, EncoderShiftBlock  # noqa
from shiftnet_tpu.ops import chw, naf_chw  # noqa: E402
from shiftnet_tpu.ops.shift import (  # noqa: E402
    grouped_spatial_shift, gsts, temporal_channel_shift)


def err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.max(np.abs(a - b))
    return d, d / (np.max(np.abs(b)) + 1e-9)


def randomize(params, seed=7):
    """Replace every param (incl. zero-init beta) with random values so no
    path is trivially identity."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [0.15 * jax.random.normal(k, l.shape, l.dtype)
              for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def main():
    dt = jnp.float32
    key = jax.random.PRNGKey(0)
    t, h, w, n = 3, 16, 96, 32        # number = 2, add_c = 16
    number = n // 2 // 8
    add_c = 8 * number

    for pf in (2, 1):
        x = jax.random.normal(key, (t, h, w, n), dt)
        xc = chw.from_nhwc(x, padr=4, pf=pf)

        # temporal shift
        for rev in (False, True):
            for bp in (False, True):
                refts = temporal_channel_shift(x, reverse=rev,
                                               boundary_patch=bp)
                gotts = chw.to_nhwc(naf_chw.temporal_shift_chw(
                    xc, reverse=rev, boundary_patch=bp))
                assert err(gotts, refts)[0] == 0, (pf, rev, bp)
        print(f'pf={pf}: temporal shift OK')

        # spatial shift
        hwref = grouped_spatial_shift(x[..., :add_c], number)
        y = naf_chw.extract_hw_chw(xc, add_c, reverse=False)
        hwgot = chw.to_nhwc(naf_chw.grouped_spatial_shift_chw(y, number))
        d, rel = err(hwgot, hwref)
        print(f'pf={pf}: spatial shift abs {d:.2e}')
        assert d == 0

        # CAB1 fused vs module
        mod1 = CAB1(n, kernel_size=5, reduction=4, dtype=dt)
        p1 = randomize(mod1.init(jax.random.PRNGKey(1), x)['params'], 11)
        ref = mod1.apply({'params': p1}, x)
        naf1 = naf_chw.naf_params_from_tree(p1)
        got = chw.to_nhwc(naf_chw.naf_cab_chw(xc, None, naf1,
                                              groups=n // 8,
                                              interpret=True))
        d, rel = err(got, ref)
        print(f'pf={pf}: CAB1 abs {d:.2e} rel {rel:.2e}')
        assert rel < 1e-4, rel

        # CAB2 fused vs module (input = gsts output)
        full = gsts(x, number, reverse=False, boundary_patch=True)
        mod2 = CAB2(n, add_c, kernel_size=5, reduction=4, dtype=dt)
        p2 = randomize(mod2.init(jax.random.PRNGKey(2), full)['params'], 12)
        ref2 = mod2.apply({'params': p2}, full)
        naf2 = naf_chw.naf_params_from_tree(p2, add_c=add_c)
        yc = naf_chw.temporal_shift_chw(xc, reverse=False,
                                        boundary_patch=True)
        hwc = naf_chw.grouped_spatial_shift_chw(
            naf_chw.extract_hw_chw(yc, add_c, reverse=False), number)
        got2 = chw.to_nhwc(naf_chw.naf_cab_chw(yc, hwc, naf2,
                                               groups=n // 8,
                                               interpret=True))
        d, rel = err(got2, ref2)
        print(f'pf={pf}: CAB2 abs {d:.2e} rel {rel:.2e}')
        assert rel < 1e-4, rel

    # full shift block, 2 rounds, vs flax module
    mod = EncoderShiftBlock(n, rounds=2, reduction=4, dtype=dt)
    x = jax.random.normal(key, (t, h, w, n), dt)
    P = randomize(mod.init(jax.random.PRNGKey(3), x)['params'], 13)
    ref = mod.apply({'params': P}, x)
    cab_params = []
    for r in range(2):
        sfx = '' if r == 0 else f'_{r}'
        cab_params.append((
            naf_chw.naf_params_from_tree(P[f'encoder_level1{sfx}__0'],
                                         add_c=add_c),
            naf_chw.naf_params_from_tree(P[f'encoder_level1{sfx}__1'])))
    for pf in (2, 1):
        got = chw.to_nhwc(naf_chw.encoder_shift_block_chw(
            cab_params, chw.from_nhwc(x, padr=4, pf=pf), rounds=2,
            boundary_patch=True, mid_ca=False, last_bias=False,
            repconv_depthwise=False, interpret=True))
        d, rel = err(got, ref)
        print(f'shift block pf={pf}: abs {d:.2e} rel {rel:.2e}')
        assert rel < 3e-4, rel
    print('ALL OK')


if __name__ == '__main__':
    main()
