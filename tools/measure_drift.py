"""Measure bf16-fused vs f32-unfused eval drift (PERF.md evidence).

The reference evaluates deblur and denoise-small in fp16
(``inference/test_deblur.py:86``, ``test_denoise_small.py:85``) and
denoise-big in fp32 (``test_denoise.py:85``).  Our bf16-fused path maps to
the fp16 protocols; this probe quantifies the PSNR gap between the
bf16-fused and f32-unfused forwards of the SAME network on a 720p-ish
structured synthetic clip, substantiating the mapping (and whether
denoise_plus could move to bf16).

Weights are seeded random inits with the residual-block betas perturbed to
0.1 (beta inits to 0, which would make every shift block an identity and
understate kernel-path drift).

Run on TPU: python tools/measure_drift.py [variant ...]
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

from shiftnet_tpu.models import CONFIGS, build_model, init_params


def synth_clip(t, h, w, seed=0):
    """Structured moving content: drifting smooth gradients + texture +
    mild noise, in [0,1] — random white noise would hide low-frequency
    precision drift behind its own energy."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([np.sin(yy / 37.0 + c) * np.cos(xx / 53.0 - c)
                     for c in range(3)], -1)
    tex = rng.standard_normal((h, w, 3)).astype(np.float32)
    frames = []
    for i in range(t):
        shift = 3 * i
        f = 0.5 + 0.25 * np.roll(base, shift, axis=1) \
            + 0.15 * np.roll(tex, shift // 2, axis=0) \
            + 0.02 * rng.standard_normal((h, w, 3)).astype(np.float32)
        frames.append(np.clip(f, 0, 1))
    return np.stack(frames)


def perturb_betas(params):
    def f(path, a):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        if name == 'beta':
            return jnp.full_like(a, 0.1)
        return a
    return jax.tree_util.tree_map_with_path(f, params)


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(255.0 ** 2 / mse)


def run(variant, t=12, h=720, w=1280):
    cfg = CONFIGS[variant]
    halo = 2
    noise = cfg.noise_map
    x = synth_clip(t + 2 * halo, h, w)
    if noise:
        s = 10.0 / 255.0
        x = np.clip(x + np.random.default_rng(1).normal(0, s, x.shape), 0, 1)

    outs = {}
    legs = [('bf16-fused', jnp.bfloat16, True),
            ('f32-unfused', jnp.float32, False)]
    if os.environ.get('SHIFTNET_DRIFT_BF16_UNFUSED', '0') == '1':
        # splits kernel-path drift from precision drift: bf16-unfused vs
        # bf16-fused isolates the Pallas path at the same dtype.
        legs.append(('bf16-unfused', jnp.bfloat16, False))
    for tag, dtype, fused in legs:
        model = build_model(variant, dtype=dtype, past_frames=halo,
                            future_frames=halo, fused_chw=fused)
        t0 = 2 * halo + 1  # init needs >=1 center frame past the halos
        params = perturb_betas(init_params(
            model, jnp.zeros((t0, 64, 64, 3), dtype),
            jnp.zeros((t0, 64, 64, 1), dtype) if noise else None, seed=0))
        xt = jnp.asarray(x, dtype)
        if noise:
            nm = jnp.full(xt.shape[:3] + (1,), s, dtype)
            fwd = jax.jit(lambda p, a, b: model.apply({'params': p}, a, b))
            o = fwd(params, xt, nm)
        else:
            fwd = jax.jit(lambda p, a: model.apply({'params': p}, a))
            o = fwd(params, xt)
        o = np.asarray(o.astype(jnp.float32))
        outs[tag] = np.clip(o, 0, 1) * 255.0
        print(f'{variant} {tag}: out shape {o.shape} '
              f'mean {float(o.mean()):.5f}', flush=True)
    d = psnr(outs['bf16-fused'], outs['f32-unfused'])
    print(f'== {variant}: PSNR(bf16-fused vs f32-unfused) = {d:.2f} dB '
          f'(drift {255.0 / (10 ** (d / 20)):.4f}/255 RMS)')
    if 'bf16-unfused' in outs:
        dp = psnr(outs['bf16-fused'], outs['bf16-unfused'])
        dd = psnr(outs['bf16-unfused'], outs['f32-unfused'])
        print(f'== {variant}: path drift (bf16 fused vs unfused) = '
              f'{dp:.2f} dB; dtype drift (bf16 vs f32, unfused) = '
              f'{dd:.2f} dB')
    return d


if __name__ == '__main__':
    variants = sys.argv[1:] or ['deblur_plus', 'denoise_small']
    for v in variants:
        # f32-unfused NHWC at 720p is 5.3x lane-padded: 16 frames needs
        # 25.3 GB HBM (measured OOM).  4 center frames (8 total) fits.
        # Denoise at 480p needs a mod-16 width (the U-Net halves H/W 3x).
        run(v, t=8, h=480, w=848) if v.startswith('denoise') else run(v, t=4)
