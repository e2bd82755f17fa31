"""TPU timing probe: TFR U-Net internal splits at the 720p bench shape.

The orb/rorb chains are ~35% of the fused 720p forward
(tools/probe_phases.py); this breaks one TFR U-Net into its per-level
CAB / down / up costs so kernel work can target the right level.

Run on TPU: python tools/probe_tfr.py [t]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from shiftnet_tpu.models.layers import TFRUNet
from shiftnet_tpu.ops import chw


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f'{name}: {dt * 1e3:.2f} ms', flush=True)
    return dt


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    h, w = 720, 1280
    dt_ = jnp.bfloat16
    c, sc = 24, 12    # deblur_plus: n_feats0=24, tfr_scale=12
    red = 4
    rng = np.random.default_rng(0)

    mod = TFRUNet(c, scale_unetfeats=sc, reduction=red, dtype=dt_)
    x = jnp.asarray(rng.standard_normal((t, h, w, c)), dt_)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x[:2, :32, :64])[
        'params']
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    xc = chw.from_nhwc(x, padr=2, pf=4)
    print(f'input packed: {xc.data.shape} pf={xc.pf}')

    # whole U-Net
    @jax.jit
    def whole(data):
        v = chw.ChwTensor(data, h, w, 2, 4, c)
        return chw.tfr_unet_chw(params, v, reduction=red).data

    timeit('tfr_unet_chw whole', whole, xc.data)

    # per-stage: L1 CAB, down12, L2 CAB, down23, L3 CAB, up32, up21
    kw = dict(reduction=red)
    c1 = params['down12']['down']['conv']['kernel'].shape[-1]
    c2 = params['down23']['down']['conv']['kernel'].shape[-1]

    @jax.jit
    def l1cab(data):
        v = chw.ChwTensor(data, h, w, 2, 4, c)
        return chw.cab_chw(v, params['encoder_level1__0'], **kw).data

    timeit('CAB L1 (720p, c=24, pf=4)', l1cab, xc.data)

    e1 = chw.cab_chw(xc, params['encoder_level1__0'], **kw)

    @jax.jit
    def d12(data):
        v = chw.ChwTensor(data, h, w, 2, 4, c)
        return chw.down_chw(v, params['down12'], c1).data

    timeit('down12', d12, e1.data)
    y2 = chw.down_chw(e1, params['down12'], c1)
    print(f'L2 packed: {y2.data.shape} pf={y2.pf} c={y2.c}')

    @jax.jit
    def l2cab(data):
        v = chw.ChwTensor(data, y2.h, y2.w, y2.padr, y2.pf, y2.c)
        return chw.cab_chw(v, params['encoder_level2__0'], **kw).data

    timeit('CAB L2 (c=36, pf=2)', l2cab, y2.data)
    e2 = chw.cab_chw(y2, params['encoder_level2__0'], **kw)

    @jax.jit
    def d23(data):
        v = chw.ChwTensor(data, e2.h, e2.w, e2.padr, e2.pf, e2.c)
        return chw.down_chw(v, params['down23'], c2).data

    timeit('down23', d23, e2.data)
    y3 = chw.down_chw(e2, params['down23'], c2)
    print(f'L3 packed: {y3.data.shape} pf={y3.pf} c={y3.c}')

    @jax.jit
    def l3cab(data):
        v = chw.ChwTensor(data, y3.h, y3.w, y3.padr, y3.pf, y3.c)
        return chw.cab_chw(v, params['encoder_level3__0'], **kw).data

    timeit('CAB L3 (c=48, pf=1)', l3cab, y3.data)

    @jax.jit
    def u32(d3, d2):
        v3 = chw.ChwTensor(d3, y3.h, y3.w, y3.padr, y3.pf, y3.c)
        v2 = chw.ChwTensor(d2, e2.h, e2.w, e2.padr, e2.pf, e2.c)
        return chw.up_skip_chw(v3, params['up32'], v2).data

    timeit('up32 (skip add)', u32, y3.data, e2.data)

    @jax.jit
    def u21(d2, d1):
        v2 = chw.ChwTensor(d2, y2.h, y2.w, y2.padr, y2.pf, y2.c)
        v1 = chw.ChwTensor(d1, h, w, 2, 4, c)
        return chw.up_skip_chw(v2, params['up21'], v1).data

    timeit('up21 (skip add)', u21, y2.data, e1.data)

    n_l1, n_l2, n_l3 = 3, 7, 6   # CAB counts per level in the U-Net
    print(f'reconstruction: {n_l1}xL1 + {n_l2}xL2 + {n_l3}xL3 + downs/ups')


if __name__ == '__main__':
    main()
