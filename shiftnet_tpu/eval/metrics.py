"""Evaluation metrics with reference-identical semantics.

The published numbers come from ``inference/test_deblur.py``:
  - PSNR: ``skimage.metrics.peak_signal_noise_ratio(output*255, gt,
    data_range=255)`` on float arrays (``test_deblur.py:142``).
  - SSIM: a scipy ``gaussian_filter`` variant, sigma=1.5 applied over the
    *CHW* array (i.e. the channel axis is filtered too), no border crop
    (``test_deblur.py:25-49``).

Both are reproduced here bit-for-bit on numpy.  ``psnr_jax``/``ssim_jax``
provide on-device batched equivalents for fast in-training validation (the
SSIM channel-axis filtering included).
"""
from __future__ import annotations

import math

import numpy as np

try:
    from scipy.ndimage import gaussian_filter
except ImportError:  # pragma: no cover
    gaussian_filter = None


def psnr(img: np.ndarray, gt: np.ndarray, data_range: float = 255.0) -> float:
    """PSNR matching skimage.peak_signal_noise_ratio on float inputs."""
    img = np.asarray(img, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    mse = np.mean((img - gt) ** 2)
    if mse == 0:
        return float('inf')
    return float(10.0 * np.log10((data_range ** 2) / mse))


def ssim(img: np.ndarray, gt: np.ndarray, sd: float = 1.5,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> float:
    """The reference's ``ssim_calculate`` (``test_deblur.py:25-49``).

    Inputs are HWC uint8-range arrays (output*255 and gt).  Internally: /255,
    transpose to CHW, 3-D gaussian filter with sigma=sd (including the channel
    axis, reflect mode), standard SSIM map, mean over everything.
    """
    assert gaussian_filter is not None, 'scipy required for reference SSIM'
    x = (np.asarray(img, dtype=np.float32) / 255).transpose(2, 0, 1)
    y = (np.asarray(gt, dtype=np.float32) / 255).transpose(2, 0, 1)
    mu1 = gaussian_filter(x, sd)
    mu2 = gaussian_filter(y, sd)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = gaussian_filter(x * x, sd) - mu1_sq
    sigma2_sq = gaussian_filter(y * y, sd) - mu2_sq
    sigma12 = gaussian_filter(x * y, sd) - mu1_mu2
    num = (2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    return float(np.mean(num / den))


# ---------------------------------------------------------------------------
# On-device (JAX) equivalents for fast validation.
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    # Matches scipy.ndimage._filters._gaussian_kernel1d.
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return (phi / phi.sum()).astype(np.float32)


def psnr_jax(img, gt, data_range: float = 255.0):
    """Batched PSNR on device; img/gt: (..., H, W, C) float, same range."""
    import jax.numpy as jnp
    x = img.astype(jnp.float32)
    y = gt.astype(jnp.float32)
    axes = tuple(range(x.ndim - 3, x.ndim))
    mse = jnp.mean((x - y) ** 2, axis=axes)
    return 10.0 * jnp.log10((data_range ** 2) / mse)


def ssim_jax(img, gt, sd: float = 1.5, c1: float = 0.01 ** 2,
             c2: float = 0.03 ** 2):
    """On-device reference-SSIM for (T, H, W, C) arrays in [0,255] range.

    Replicates the scipy reflect-mode separable gaussian (channel axis
    included, truncate=4.0).  Returns per-frame scalars (T,).
    """
    import jax.numpy as jnp

    radius = int(4.0 * sd + 0.5)
    k = jnp.asarray(_gaussian_kernel1d(sd, radius))

    def filt_axis(v, axis):
        pad = [(0, 0)] * v.ndim
        pad[axis] = (radius, radius)
        # scipy.ndimage 'reflect' duplicates the edge sample == numpy
        # 'symmetric' (NOT numpy 'reflect').
        vp = jnp.pad(v, pad, mode='symmetric')
        vp = jnp.moveaxis(vp, axis, -1)
        out = jnp.apply_along_axis(
            lambda row: jnp.convolve(row, k[::-1], mode='valid'), -1, vp)
        return jnp.moveaxis(out, -1, axis)

    def gauss3(v):  # filter H, W, C axes of (T, H, W, C)
        for ax in (1, 2, 3):
            v = filt_axis(v, ax)
        return v

    x = img.astype(jnp.float32) / 255.0
    y = gt.astype(jnp.float32) / 255.0
    mu1, mu2 = gauss3(x), gauss3(y)
    s1 = gauss3(x * x) - mu1 * mu1
    s2 = gauss3(y * y) - mu2 * mu2
    s12 = gauss3(x * y) - mu1 * mu2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
