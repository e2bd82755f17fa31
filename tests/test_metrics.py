"""Metric parity: our numpy/JAX metrics vs skimage/scipy oracles."""
import numpy as np
import pytest

from shiftnet_tpu.eval.metrics import psnr, psnr_jax, ssim, ssim_jax


@pytest.fixture
def imgs():
    rng = np.random.default_rng(3)
    gt = rng.uniform(0, 255, (24, 32, 3)).astype(np.float32)
    out = np.clip(gt + rng.normal(0, 12, gt.shape), 0, 255).astype(np.float32)
    return out, gt


def test_psnr_matches_skimage(imgs):
    out, gt = imgs
    skimage = pytest.importorskip('skimage.metrics')
    want = skimage.peak_signal_noise_ratio(out, gt, data_range=255)
    assert abs(psnr(out, gt) - want) < 1e-9


def test_ssim_matches_reference_formula(imgs):
    out, gt = imgs
    # Independent recomputation of test_deblur.py:25-49 via scipy.
    from scipy.ndimage import gaussian_filter
    x = (out / 255).transpose(2, 0, 1)
    y = (gt / 255).transpose(2, 0, 1)
    mu1, mu2 = gaussian_filter(x, 1.5), gaussian_filter(y, 1.5)
    s1 = gaussian_filter(x * x, 1.5) - mu1 ** 2
    s2 = gaussian_filter(y * y, 1.5) - mu2 ** 2
    s12 = gaussian_filter(x * y, 1.5) - mu1 * mu2
    want = np.mean(((2 * mu1 * mu2 + 1e-4) * (2 * s12 + 9e-4)) /
                   ((mu1 ** 2 + mu2 ** 2 + 1e-4) * (s1 + s2 + 9e-4)))
    assert abs(ssim(out, gt) - want) < 1e-7


def test_jax_metrics_match_numpy(imgs):
    out, gt = imgs
    import jax.numpy as jnp
    p = float(psnr_jax(jnp.asarray(out), jnp.asarray(gt)))
    assert abs(p - psnr(out, gt)) < 1e-3
    s = float(ssim_jax(jnp.asarray(out)[None], jnp.asarray(gt)[None])[0])
    assert abs(s - ssim(out, gt)) < 2e-4
