"""Benchmark: deblur_plus 720p throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): 30 fps/chip for 720p video deblurring.

Protocol: windowed inference like the reference benchmark harness
(``inference/test_deblur.py``: one_len frames + 2+2 halo per window),
driven through the SAME ``Evaluator`` forward/envelope the eval CLIs use
(``shiftnet_tpu/eval/runner.py``) — the scored fps is the harness fps.
bf16 compute; fps = predicted output frames per wall-clock second, steady
state, device-resident input/output (host I/O excluded; the reference
benchmark also measures the model forward only).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    from shiftnet_tpu.eval.runner import Evaluator
    from shiftnet_tpu.eval.window import half_slices
    from shiftnet_tpu.models import init_params

    # Env knobs for perf sweeps; defaults are the shipping configuration.
    one_len = int(os.environ.get('SHIFTNET_BENCH_ONELEN', '36'))
    overrides = {}
    if os.environ.get('SHIFTNET_BENCH_CHW', '1') != '1':
        overrides['fused_chw'] = False
    if os.environ.get('SHIFTNET_BENCH_TFR', '0') == '1':
        overrides['fused_tfr'] = True
    halo = 2
    h, w = 720, 1280
    t = one_len + 2 * halo

    ev = Evaluator('deblur_plus', None, bf16=True, overrides=overrides,
                   result_path='/tmp/bench_results')
    video = jax.random.uniform(jax.random.PRNGKey(0), (t, h, w, 3),
                               jnp.bfloat16)
    # params are shape-independent; init on a small clip to keep the
    # (uncached) init compile fast.
    ev.params = init_params(ev.model, video[: 2 * halo + 1, :64, :64],
                            seed=1)

    # The Evaluator's window plan (eval/budget.py): XLA's compile-time
    # memory analysis decides full-frame vs half-height tiles against the
    # HBM budget — no hand px constant (the round-4 bench OOM).  A runtime
    # RESOURCE_EXHAUSTED at warmup is the last-resort fallback to tiles.
    from shiftnet_tpu.eval.budget import hbm_budget

    def half_tiles():
        return [jnp.asarray(video[:, in_sl[0], in_sl[1]])
                for in_sl, _, _ in half_slices(h, w)]

    use_full = t * h * w <= ev.px_envelope * 1.5
    if use_full and ev._memory_gate:
        prog = ev._window_program_bytes((t, h, w, 3))
        use_full = prog <= hbm_budget()
        print(f'# full-window program {prog / 1e9:.2f} GB, budget '
              f'{hbm_budget() / 1e9:.2f} GB -> '
              f'{"full" if use_full else "half tiles"}',
              file=sys.stderr, flush=True)
    tiles = [video] if use_full else half_tiles()
    fwd = ev._forward((t,) + tiles[0].shape[1:])

    # Compile + warmup; then DRAIN via a data fetch: on this backend
    # block_until_ready can return before execution finishes, so only an
    # actual device->host transfer is a reliable fence.
    try:
        for tile in tiles:
            out = fwd(ev.params, tile)
        float(jnp.sum(out.astype(jnp.float32)))
    except Exception as e:
        if 'RESOURCE_EXHAUSTED' not in str(e) or len(tiles) > 1:
            raise
        print('# runtime OOM at full window -> half-height tiles',
              file=sys.stderr, flush=True)
        tiles = half_tiles()
        fwd = ev._forward((t,) + tiles[0].shape[1:])
        for tile in tiles:
            out = fwd(ev.params, tile)
        float(jnp.sum(out.astype(jnp.float32)))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        for tile in tiles:
            out = fwd(ev.params, tile)
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
