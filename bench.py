"""Benchmark: deblur_plus forward throughput at 1280x720 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): 30 fps/chip for 720p video deblurring.

Protocol: windowed inference exactly like the reference benchmark harness
(``inference/test_deblur.py``: one_len frames + 2+2 halo per window, fp16
there / bf16 here), steady-state timing over several iterations after
compile+warmup, fps = predicted frames per second.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    from shiftnet_tpu.models import build_model, init_params

    one_len = 12          # frames predicted per window
    halo = 2
    h, w = 720, 1280
    t = one_len + 2 * halo

    model = build_model('deblur_plus', dtype=jnp.bfloat16,
                        past_frames=halo, future_frames=halo)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (t, h, w, 3), jnp.bfloat16)
    params = init_params(model, x[: 2 * halo + 1], seed=1)

    @jax.jit
    def forward(params, x):
        return model.apply({'params': params}, x)

    # Compile + warmup.
    out = forward(params, x)
    out.block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, x)
    out.block_until_ready()
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
