"""Probe the single-chip HBM envelope of the fused eval forward.

For each requested window length T, AOT-compiles the Evaluator's forward at
(T, H, W, 3) and prints XLA's own buffer-assignment totals
(``compiled.memory_analysis()``) — the authoritative, shape-derived program
requirement (includes fragmentation).  ``--run`` additionally executes the
window with random input and a device->host fetch to detect runtime OOM
(runtime allocations — input staging, warmup — sit on top of the program
requirement, so a compile-time fit is necessary but not sufficient).

Usage:
  python tools/probe_envelope.py --t 36 40 --run
  python tools/probe_envelope.py --t 40 --half   # half-height tiles
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variant', default='deblur_plus')
    ap.add_argument('--t', type=int, nargs='+', default=[36, 40])
    ap.add_argument('--hw', type=int, nargs=2, default=[720, 1280])
    ap.add_argument('--half', action='store_true',
                    help='probe the half-height tile shape instead')
    ap.add_argument('--run', action='store_true')
    ap.add_argument('--no-shift-kernel', action='store_true',
                    help='A-B: disable the fused shift-round Pallas kernel')
    ap.add_argument('--l3-nhwc', action='store_true',
                    help='A-B: round-3 layout (NHWC L3 island, padr=4)')
    ap.add_argument('--override', action='append', default=[],
                    help='model config overrides, e.g. stage2_chunk=0')
    args = ap.parse_args()
    if args.no_shift_kernel:
        os.environ['SHIFTNET_NO_SHIFT_KERNEL'] = '1'
    if args.l3_nhwc:
        os.environ['SHIFTNET_L3_NHWC'] = '1'
    overrides = {}
    for kv in args.override:
        k, _, v = kv.partition('=')
        overrides[k] = int(v) if v.lstrip('-').isdigit() else v

    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    from shiftnet_tpu.eval.runner import Evaluator
    from shiftnet_tpu.eval.window import half_slices
    from shiftnet_tpu.models import init_params

    h, w = args.hw
    ev = Evaluator(args.variant, None, bf16=True, overrides=overrides,
                   result_path='/tmp/probe_envelope')
    if args.half:
        in_sl, _, _ = half_slices(h, w)[0]
        h = in_sl[0].stop - in_sl[0].start
        w = in_sl[1].stop - in_sl[1].start
        print(f'half tile: {h}x{w}')
    dummy = jnp.zeros((5, 64, 64, 3), jnp.bfloat16)
    ev.params = init_params(ev.model, dummy, seed=1)
    pspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), ev.params)

    for t in args.t:
        shape = (t, h, w, 3)
        fn = ev._forward(shape)
        x_spec = jax.ShapeDtypeStruct(shape, jnp.bfloat16)
        t0 = time.time()
        compiled = fn.lower(pspec, x_spec).compile()
        ma = compiled.memory_analysis()
        tot = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
               + ma.output_size_in_bytes)
        print(f'T={t} {h}x{w}: px={t * h * w / 1e6:.2f}M '
              f'temp={ma.temp_size_in_bytes / 1e9:.3f}G '
              f'args={ma.argument_size_in_bytes / 1e9:.3f}G '
              f'out={ma.output_size_in_bytes / 1e9:.3f}G '
              f'total={tot / 1e9:.3f}G '
              f'(compile {time.time() - t0:.0f}s)', flush=True)
        if args.run:
            x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.bfloat16)
            try:
                t0 = time.time()
                out = compiled(ev.params, x)
                s = float(jnp.sum(out.astype(jnp.float32)))
                print(f'  RUN ok ({time.time() - t0:.1f}s, sum={s:.3g})',
                      flush=True)
                del out
            except Exception as e:  # noqa: BLE001
                print(f'  RUN FAILED: {type(e).__name__}: '
                      f'{str(e)[:200]}', flush=True)
            del x


if __name__ == '__main__':
    main()
