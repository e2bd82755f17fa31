"""Deblur evaluation CLI — replaces ``inference/test_deblur{,_small}.py``.

Usage:
  python -m shiftnet_tpu.tools.test_deblur --variant deblur_plus \
      --model_path ckpt.npz --data_path DeepVideoDeblurring_Dataset/GoPro \
      --one_len 48 [--fp32] [--save_image]

``--model_path`` accepts our ``.npz`` exports or reference ``.pth`` files
(converted on the fly).
"""
import argparse

import jax
import jax.numpy as jnp

from shiftnet_tpu.eval.runner import Evaluator
from shiftnet_tpu.models import build_model
from shiftnet_tpu.tools.params_io import load_params


def main():
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument('--variant', default='deblur_plus',
                    choices=['deblur_plus', 'deblur_small'])
    ap.add_argument('--model_path', required=True)
    ap.add_argument('--data_path', required=True)
    ap.add_argument('--result_path', default='infer_results')
    ap.add_argument('--one_len', type=int, default=48)
    ap.add_argument('--fp32', action='store_true')
    ap.add_argument('--tp', type=int, default=1,
                    help='shard each window over a tp-way time mesh '
                         '(sequence-parallel inference; needs tp devices). '
                         'Interior shard boundaries see exactly halo frames '
                         'of context — equal to windowed inference with '
                         'window = T/tp.')
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
    from shiftnet_tpu.tools.test_denoise import parse_metric_args
    ev = Evaluator(args.variant, params, result_path=args.result_path,
                   bf16=False if args.fp32 else None,
                   save_images=args.save_image,
                   metrics=parse_metric_args(args.metric), tp=args.tp)
    from shiftnet_tpu.utils.profiling import trace
    with trace(args.profile):
        res = ev.eval_deblur(args.data_path, one_len=args.one_len,
                             grids=args.grids, crop_size=args.crop_size,
                             trans_num=args.trans_num)
    print(res)


if __name__ == '__main__':
    main()
