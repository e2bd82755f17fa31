"""Validation metric registry.

Mirrors the reference's by-name metric dispatch: ``basicsr/metrics/__init__.py:7-10``
(``calculate_metric`` resolving ``opt['type']``) consumed by the
``with_metrics`` validation loop
(``basicsr/models/image_restoration_model.py:392-425``), where a config like

    val:
      metrics:
        psnr: {type: calculate_psnr, crop_border: 0, test_y_channel: false}
        niqe: {type: calculate_niqe, crop_border: 0}

runs every named metric over each validation output.  All registered
functions take uint8-range HWC numpy images.
"""
from __future__ import annotations

from typing import Any, Callable

from shiftnet_tpu.eval.basicsr_metrics import calculate_psnr, calculate_ssim
from shiftnet_tpu.eval.metrics import psnr as psnr_scipy, ssim as ssim_scipy
from shiftnet_tpu.eval.niqe import calculate_niqe

def _psnr(img, img2, **kw):
    return psnr_scipy(img, img2, **kw)


def _ssim(img, img2, **kw):
    return ssim_scipy(img, img2, **kw)


# 'psnr'/'ssim' are the inference-local protocol the published numbers use
# (``inference/test_deblur.py:25-49``, skimage PSNR + scipy-gaussian SSIM);
# 'calculate_*' are the BasicSR validation variants.  All take (img, img2).
METRIC_FUNCS: dict[str, Callable] = {
    'psnr': _psnr,
    'ssim': _ssim,
    'calculate_psnr': calculate_psnr,
    'calculate_ssim': calculate_ssim,
    'calculate_niqe': calculate_niqe,
}

# Metrics that are no-reference (take only the restored image).
NO_REFERENCE = {'calculate_niqe'}


def calculate_metric(data: dict[str, Any], opt: dict[str, Any]) -> float:
    """Reference ``basicsr.metrics.calculate_metric``: ``opt['type']`` picks
    the function; remaining keys are kwargs; ``data`` carries img/img2."""
    opt = dict(opt)
    metric_type = opt.pop('type')
    fn = METRIC_FUNCS[metric_type]
    if metric_type in NO_REFERENCE:
        return float(fn(data['img'], **opt))
    return float(fn(data['img'], data['img2'], **opt))


def score_pair(img, gt, metrics: dict[str, dict[str, Any]]) -> dict[str, float]:
    """Run every configured metric on one (restored, gt) image pair.

    ``metrics``: {name: {'type': ..., **kwargs}} — the reference's
    ``val.metrics`` config shape (``options/*.yml`` / ``with_metrics`` loop).
    """
    return {name: calculate_metric({'img': img, 'img2': gt}, mopt)
            for name, mopt in metrics.items()}
