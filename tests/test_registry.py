"""Metric registry dispatch tests (eval/registry.py) — reference
``basicsr/metrics/__init__.py:7-10`` + the ``with_metrics`` validation loop
(``image_restoration_model.py:392-425``)."""
import numpy as np
import pytest

from shiftnet_tpu.eval.registry import (METRIC_FUNCS, calculate_metric,
                                        score_pair)
from shiftnet_tpu.eval.metrics import psnr as psnr_scipy, ssim as ssim_scipy
from shiftnet_tpu.eval.basicsr_metrics import calculate_psnr


@pytest.fixture(scope='module')
def imgs():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 255, (128, 96, 3)).astype(np.float64)
    img = np.clip(gt + rng.normal(0, 12, gt.shape), 0, 255)
    return img, gt


def test_dispatch_matches_direct_call(imgs):
    img, gt = imgs
    got = calculate_metric({'img': img, 'img2': gt}, {'type': 'psnr'})
    assert got == pytest.approx(psnr_scipy(img, gt))
    got = calculate_metric({'img': img, 'img2': gt},
                           {'type': 'calculate_psnr', 'crop_border': 4})
    assert got == pytest.approx(calculate_psnr(img, gt, crop_border=4))


def test_no_reference_metric_drops_gt(imgs):
    img, gt = imgs
    v = calculate_metric({'img': img, 'img2': gt},
                         {'type': 'calculate_niqe', 'crop_border': 0})
    assert np.isfinite(v)


def test_score_pair_runs_all_configured(imgs):
    img, gt = imgs
    metrics = {
        'psnr': {'type': 'psnr'},
        'ssim': {'type': 'ssim'},
        'niqe': {'type': 'calculate_niqe', 'crop_border': 0},
    }
    out = score_pair(img, gt, metrics)
    assert set(out) == {'psnr', 'ssim', 'niqe'}
    assert out['psnr'] == pytest.approx(psnr_scipy(img, gt))
    assert out['ssim'] == pytest.approx(ssim_scipy(img, gt))
    assert all(np.isfinite(v) for v in out.values())


def test_registry_covers_reference_surface():
    # the reference's metric module exports psnr/ssim/niqe
    # (basicsr/metrics/__init__.py:7) plus the inference-local pair
    for name in ('psnr', 'ssim', 'calculate_psnr', 'calculate_ssim',
                 'calculate_niqe'):
        assert name in METRIC_FUNCS
