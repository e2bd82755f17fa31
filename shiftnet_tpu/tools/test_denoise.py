"""Denoise evaluation CLI — replaces ``inference/test_denoise{,_small}.py``.

Usage:
  python -m shiftnet_tpu.tools.test_denoise --variant denoise_plus \
      --model_path ckpt.npz --data_path Set8 --sigma 10 [--fp32] [--no_tile]
"""
import argparse

from shiftnet_tpu.eval.runner import Evaluator
from shiftnet_tpu.tools.params_io import load_params


def main():
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument('--variant', default='denoise_plus',
                    choices=['denoise_plus', 'denoise_small'])
    ap.add_argument('--model_path', required=True)
    ap.add_argument('--data_path', required=True)
    ap.add_argument('--result_path', default='infer_results')
    ap.add_argument('--sigma', type=float, default=10.0)
    ap.add_argument('--fp32', action='store_true',
                    help='(now the denoise default) force f32 eval')
    ap.add_argument('--bf16', action='store_true',
                    help='opt into bf16 eval (measured 28 dB output drift '
                         'at sigma=10 — NOT parity-safe; see PERF.md)')
    ap.add_argument('--quadrant', action='store_true',
                    help="force the reference's fixed 4-quadrant tiling "
                         '(test_denoise.py:153-173); default is the '
                         'envelope-driven full-frame window')
    ap.add_argument('--no_tile', action='store_true',
                    help='deprecated alias: full-frame is now the default')
    ap.add_argument('--tp', type=int, default=1,
                    help='shard each window over a tp-way time mesh '
                         '(sequence-parallel inference; needs tp devices)')
    ap.add_argument('--metric', action='append', default=None,
                    help='metric registry entries, e.g. '
                         '--metric niqe=calculate_niqe (repeatable); '
                         'default psnr+ssim')
    ap.add_argument('--save_image', action='store_true')
    ap.add_argument('--profile', default=None,
                    help='capture a jax.profiler trace to this dir')
    ap.add_argument('--grids', action='store_true',
                    help='validation-style overlap-averaged crop tiling '
                         '(reference image_restoration_model.py:161-252)')
    ap.add_argument('--crop_size', type=int, default=256)
    ap.add_argument('--trans_num', type=int, default=1,
                    help='number of rot/flip TTA transforms per crop (1-8)')
    args = ap.parse_args()

    params = load_params(args.variant, args.model_path, halo=2)
    metrics = parse_metric_args(args.metric)
    assert not (args.fp32 and args.bf16), '--fp32 and --bf16 conflict'
    ev = Evaluator(args.variant, params, result_path=args.result_path,
                   bf16=True if args.bf16 else (False if args.fp32 else None),
                   save_images=args.save_image, metrics=metrics, tp=args.tp)
    from shiftnet_tpu.utils.profiling import trace
    with trace(args.profile):
        res = ev.eval_denoise(args.data_path, args.sigma,
                              tile=args.quadrant, grids=args.grids,
                              crop_size=args.crop_size,
                              trans_num=args.trans_num)
    print(res)


def parse_metric_args(entries):
    """['niqe=calculate_niqe', 'psnr=psnr'] -> registry metric dict."""
    if not entries:
        return None
    out = {}
    for e in entries:
        name, _, typ = e.partition('=')
        out[name] = {'type': typ or name}
    return out


if __name__ == '__main__':
    main()
