"""Denoise throughput probe: denoise_plus 480p sigma=10 on one chip.

Mirrors ``bench.py`` but for the DAVIS/Set8 sigma-sweep protocol of
``inference/test_denoise.py`` (the BASELINE.json denoise config): windowed
forward with constant noise map, driven through the same Evaluator
forward/envelope the eval CLI uses.  Reports fps for the shipping f32
protocol (reference ``test_denoise.py:85`` runs fp32) and, for comparison,
the bf16-fused path (viable iff the measured drift — tools/measure_drift.py
— stays under the 0.05 dB parity bar).

Run on TPU: python tools/bench_denoise.py [--bf16]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    from shiftnet_tpu.eval.runner import Evaluator
    from shiftnet_tpu.eval.window import half_slices
    from shiftnet_tpu.models import init_params

    bf16 = '--bf16' in sys.argv
    f32_fused = '--f32-fused' in sys.argv  # packed kernels at f32 (probe)
    one_len = int(os.environ.get('SHIFTNET_BENCH_ONELEN', '12'))
    halo = 2
    # DAVIS 480p is 854 wide; the eval CLI mod-pads to the U-Net's factor
    # (eval/window.py) — bench the padded-to-mod-16 extent directly.
    h, w = 480, 848
    t = one_len + 2 * halo
    sigma = 10.0 / 255.0

    overrides = {'fused_chw': True} if f32_fused else None
    ev = Evaluator('denoise_plus', None, bf16=bf16, overrides=overrides,
                   result_path='/tmp/bench_results')
    video = jax.random.uniform(jax.random.PRNGKey(0), (t, h, w, 3), ev.dtype)
    ev.params = init_params(ev.model, video[: 2 * halo + 1, :64, :64],
                            jnp.zeros((2 * halo + 1, 64, 64, 1), ev.dtype),
                            seed=1)

    if t * h * w > ev.px_envelope:
        tiles = [jnp.asarray(video[:, in_sl[0], in_sl[1]])
                 for in_sl, _, _ in half_slices(h, w)]
        mode = f'{len(tiles)} half tiles'
    else:
        tiles = [video]
        mode = 'full frame'
    fwd = ev._forward((t,) + tiles[0].shape[1:])

    def run_all():
        for tile in tiles:
            nm = jnp.full(tile.shape[:3] + (1,), sigma, ev.dtype)
            out = fwd(ev.params, tile, nm)
        return out

    out = run_all()
    float(jnp.sum(out.astype(jnp.float32)))  # fence (see bench.py)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_all()
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0

    fps = one_len * iters / dt
    print(json.dumps({
        'metric': 'denoise_plus_480p_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/s',
        'precision': ('bf16-fused' if bf16
                      else 'f32-fused' if f32_fused else 'f32-unfused'),
        'window': mode,
    }))


if __name__ == '__main__':
    main()
