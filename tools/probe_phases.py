"""TPU timing probe: whole-model phase budget for the fused 720p path.

Times the full deblur_plus forward and its major phases separately at the
bench shapes, so kernel work can be prioritized by actual share:
  - full forward (T frames, 720p, fused_chw)
  - orb chain (5 TFR U-Nets, full-res packed grid)     [stage0]
  - Encoder2 (shift blocks + downs/ups + L3 island)    [stage1]
  - single EncoderShiftBlock at the L1 / L2 shapes
  - single TFR U-Net at full res

Run: python tools/probe_phases.py [t]   (default T=12; bench uses 40)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from shiftnet_tpu.models import CONFIGS, build_model, init_params
from shiftnet_tpu.models.layers import EncoderShiftBlock, TFRUNet
from shiftnet_tpu.ops import chw


def timeit(name, fn, *args, iters=4, t_frames=None):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    d = leaf.data if isinstance(leaf, chw.ChwTensor) else leaf
    float(jnp.sum(d[..., :1].astype(jnp.float32)))  # fence via fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    d = leaf.data if isinstance(leaf, chw.ChwTensor) else leaf
    float(jnp.sum(d[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    per_frame = f'  ({dt * 1e3 / t_frames:.2f} ms/frame)' if t_frames else ''
    print(f'{name}: {dt * 1e3:.1f} ms{per_frame}', flush=True)
    return dt


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    h, w = 720, 1280
    dt_ = jnp.bfloat16
    cfg = CONFIGS['deblur_plus']
    key = jax.random.PRNGKey(0)

    # --- full fused forward ---------------------------------------------
    model = build_model('deblur_plus', dtype=dt_, fused_chw=True)
    x = jax.random.uniform(key, (t, h, w, 3), dt_)
    params = init_params(model, x[:3, :64, :64], seed=1)
    fwd = jax.jit(lambda p, v: model.apply({'params': p}, v))
    d_full = timeit(f'full fused forward (T={t}, 720p)', fwd, params, x,
                    t_frames=t)

    # --- single TFR U-Net at full-res packed shape ------------------------
    tfr_kw = dict(kernel_size=3, reduction=cfg.ca_reduction,
                  scale_unetfeats=cfg.tfr_scale,
                  downsample_prelu=cfg.downsample_prelu, dtype=dt_)
    nf0 = cfg.n_feats0
    x0n = jax.random.uniform(key, (t, h, w, nf0), dt_)
    x0 = chw.from_nhwc(x0n, padr=4, pf=4)
    tfr = TFRUNet(nf0, **tfr_kw)
    ptfr = jax.jit(tfr.init)(jax.random.PRNGKey(1),
                             jnp.zeros((1, 16, 16, nf0), dt_))['params']
    tfr_fn = jax.jit(lambda p, v: tfr.apply({'params': p}, v))
    d_tfr = timeit('TFR U-Net x1 (full res, packed)', tfr_fn, ptfr, x0,
                   t_frames=t)
    print(f'  -> orb+rorb chains (x{2 * cfg.num_orbs}): '
          f'~{d_tfr * 2 * cfg.num_orbs * 1e3:.0f} ms '
          f'({d_tfr * 2 * cfg.num_orbs * 1e3 / t:.1f} ms/frame)')

    # --- single shift block at the L1 and L2 shapes -----------------------
    nf = cfg.n_feats2
    for name, (hh, ww, pf) in (('L1', (h // 2, w // 2, 2)),
                               ('L2', (h // 4, w // 4, 1))):
        xs = chw.from_nhwc(
            jax.random.uniform(key, (t, hh, ww, nf), dt_), padr=4, pf=pf)
        blk = EncoderShiftBlock(nf, rounds=cfg.shift_rounds,
                                reduction=cfg.ca_reduction, dtype=dt_)
        pblk = jax.jit(blk.init)(jax.random.PRNGKey(2),
                                 jnp.zeros((3, 16, 16, nf), dt_))['params']
        blk_fn = jax.jit(lambda p, v, m=blk: m.apply({'params': p}, v))
        d_blk = timeit(f'EncoderShiftBlock {name} ({cfg.shift_rounds} '
                       f'rounds)', blk_fn, pblk, xs, t_frames=t)
        n_blocks = 6  # encoder_level{1,1_1,1_2} + decoder same, per level
        print(f'  -> x{n_blocks} {name} blocks: '
              f'~{d_blk * n_blocks * 1e3:.0f} ms '
              f'({d_blk * n_blocks * 1e3 / t:.1f} ms/frame)')


if __name__ == '__main__':
    main()
