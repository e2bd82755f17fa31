"""Benchmark: deblur_plus 720p throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): 30 fps/chip for 720p video deblurring.

Protocol: windowed inference like the reference benchmark harness
(``inference/test_deblur.py``: one_len frames + 2+2 halo per window) with the
reference's 4-quadrant spatial tiling (``inference/test_denoise.py:153-173``)
— required here because a full 720p x 16-frame window exceeds the 16 GB v5e
HBM (the A100s the reference ran on have 40-80 GB).  bf16 compute.  fps =
predicted output frames per wall-clock second, steady state.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    from shiftnet_tpu.models import build_model, init_params
    from shiftnet_tpu.eval.window import half_slices

    # Env knobs for perf sweeps; defaults are the shipping configuration.
    one_len = int(os.environ.get('SHIFTNET_BENCH_ONELEN', '36'))
    fused_tfr = os.environ.get('SHIFTNET_BENCH_TFR', '0') == '1'
    fused_chw = os.environ.get('SHIFTNET_BENCH_CHW', '1') == '1'
    halo = 2
    h, w = 720, 1280
    t = one_len + 2 * halo

    model = build_model('deblur_plus', dtype=jnp.bfloat16,
                        fused_tfr=fused_tfr, fused_chw=fused_chw,
                        past_frames=halo, future_frames=halo)
    rng = jax.random.PRNGKey(0)
    video = jax.random.uniform(rng, (t, h, w, 3), jnp.bfloat16)
    # params are shape-independent; init on a small clip to keep the
    # (uncached) init compile fast.
    params = init_params(model, video[: 2 * halo + 1, :64, :64], seed=1)

    @jax.jit
    def forward(params, x):
        return model.apply({'params': params}, x)

    if os.environ.get('SHIFTNET_BENCH_FULLFRAME', '1') == '1':
        # Dense packed-CHW activations are ~3-5x smaller than the NHWC
        # padded ones — a full 720p window fits the 16 GB HBM, dropping
        # the half-tile overlap waste entirely.
        tiles = [video]
    else:
        tiles = [jnp.asarray(video[:, in_sl[0], in_sl[1]])
                 for in_sl, _, _ in half_slices(h, w)]

    # Compile + warmup; then DRAIN via a data fetch: on this backend
    # block_until_ready can return before execution finishes, so only an
    # actual device->host transfer is a reliable fence.
    for tile in tiles:
        out = forward(params, tile)
    float(jnp.sum(out.astype(jnp.float32)))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        for tile in tiles:
            out = forward(params, tile)
    # Device executes in order; fetching the last output implies all prior
    # windows completed.
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0

    fps = one_len * iters / dt
    print(json.dumps({
        'metric': 'deblur_plus_720p_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/s',
        'vs_baseline': round(fps / 30.0, 3),
    }))


if __name__ == '__main__':
    main()
