"""TPU timing probe: shift-round component kernels at the 720p L1/L2 shapes.

Times the gate / rep / back kernels and the XLA-side shift ops separately
(each chained k times inside one jit to amortize dispatch), at the exact
shapes the fused 720p deblur_plus path produces inside Encoder2.

Run: python tools/probe_round.py [t]
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

from shiftnet_tpu.models.layers import CAB1, CAB2
from shiftnet_tpu.ops import chw, naf_chw


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # fence via fetch (block_until_ready unreliable on this backend)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f'{name}: {dt * 1e3:.2f} ms')
    return dt


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n, add_c = 80, 40
    number = add_c // 8
    dt_ = jnp.bfloat16
    rng = np.random.default_rng(0)

    # padr mirrors the fused model path: 4 at L1 (pf=2), 8 at L2 (pf=1,
    # models/gshift.py up32 conversion) so shift_round_chw is eligible.
    for lname, h, w, pf, padr in [('L1', 360, 640, 2, 4),
                                  ('L2', 180, 320, 1, 8)]:
        print(f'--- {lname}: ({t},{h},{w},{n}) pf={pf} ---')
        x = jnp.asarray(rng.standard_normal((t, h, w, n)), dt_)
        mod2 = CAB2(n, add_c, kernel_size=5, reduction=4, dtype=dt_)
        mod1 = CAB1(n, kernel_size=5, reduction=4, dtype=dt_)
        p2 = jax.jit(mod2.init)(jax.random.PRNGKey(1),
                                jnp.zeros((1, 8, 8, n + add_c), dt_))['params']
        p1 = jax.jit(mod1.init)(jax.random.PRNGKey(2),
                                jnp.zeros((1, 8, 8, n), dt_))['params']
        naf2 = naf_chw.naf_params_from_tree(
            jax.tree.map(jnp.asarray, p2), add_c=add_c)
        naf1 = naf_chw.naf_params_from_tree(jax.tree.map(jnp.asarray, p1))

        xc = chw.from_nhwc(x, padr=padr, pf=pf)

        @jax.jit
        def shifts(data):
            xt = chw.ChwTensor(data, h, w, padr, pf, n)
            y = naf_chw.temporal_shift_chw(xt, reverse=False,
                                           boundary_patch=True)
            hw = naf_chw.extract_hw_chw(y, add_c, reverse=False)
            hw = naf_chw.grouped_spatial_shift_chw(hw, number)
            return y.data, hw.data

        ydata, hwdata = shifts(xc.data)
        timeit('shift ops (temporal+extract+spatial)', shifts, xc.data)

        @jax.jit
        def fused_shift(data):
            xt = chw.ChwTensor(data, h, w, padr, pf, n)
            y, hw = naf_chw.shift_round_chw(xt, add_c, number,
                                            reverse=False,
                                            boundary_patch=True)
            return y.data, hw.data

        yf, hwf = fused_shift(xc.data)
        err = max(float(jnp.max(jnp.abs((yf - ydata).astype(jnp.float32)))),
                  float(jnp.max(jnp.abs((hwf - hwdata).astype(jnp.float32)))))
        timeit(f'fused shift kernel (err={err})', fused_shift, xc.data)

        @jax.jit
        def temporal_only(data):
            xt = chw.ChwTensor(data, h, w, padr, pf, n)
            return naf_chw.temporal_shift_chw(xt, reverse=False,
                                              boundary_patch=True).data

        @jax.jit
        def gsts_only(data):
            yt = chw.ChwTensor(data, h, w, padr, pf, n)
            return naf_chw.gsts_hw_chw(yt, add_c, number,
                                       reverse=False).data

        temporal_only(xc.data)
        timeit('  temporal shift alone', temporal_only, xc.data)
        gsts_only(ydata)
        timeit('  gsts (extract+spatial) alone', gsts_only, ydata)

        @jax.jit
        def cab2(ydata, hwdata):
            y = chw.ChwTensor(ydata, h, w, padr, pf, n)
            hw = chw.ChwTensor(hwdata, h, w, padr, pf, add_c)
            return naf_chw.naf_cab_chw(y, hw, naf2, groups=n // 8,
                                       interpret=False).data

        @jax.jit
        def cab1(data):
            xt = chw.ChwTensor(data, h, w, padr, pf, n)
            return naf_chw.naf_cab_chw(xt, None, naf1, groups=n // 8,
                                       interpret=False).data

        d2 = timeit('CAB2 (gate+rep+back)', cab2, ydata, hwdata)
        d1 = timeit('CAB1 (gate+rep+back)', cab1, ydata)
        print(f'  => per round {(d1 + d2) * 1e3:.1f} ms')

        # cumulative stage timings (gate; gate+rep; full) for both CABs
        for probe in ('gate', 'rep'):
            fn1 = jax.jit(lambda data, _p=probe: jax.tree.leaves(
                naf_chw.naf_cab_chw(
                    chw.ChwTensor(data, h, w, padr, pf, n), None, naf1,
                    groups=n // 8, stage=_p, interpret=False))[0])
            timeit(f'CAB1 through {probe}', fn1, ydata)
            fn2 = jax.jit(lambda yd, hd, _p=probe: jax.tree.leaves(
                naf_chw.naf_cab_chw(
                    chw.ChwTensor(yd, h, w, padr, pf, n),
                    chw.ChwTensor(hd, h, w, padr, pf, add_c), naf2,
                    groups=n // 8, stage=_p, interpret=False))[0])
            timeit(f'CAB2 through {probe}', fn2, ydata, hwdata)


if __name__ == '__main__':
    main()
