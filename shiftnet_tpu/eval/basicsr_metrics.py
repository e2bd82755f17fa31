"""BasicSR-style PSNR/SSIM with crop-border and Y-channel options.

Surface parity with the reference ``basicsr/metrics/psnr_ssim.py``:
``calculate_psnr`` (:15-69) and ``calculate_ssim`` (:235-309): the color
path uses an 11x11x11 separable-gaussian *3D* SSIM over (H, W, C) with
replicate padding (``_ssim_3d``, :151-190); the Y-channel path uses the 2D
11x11 gaussian with replicate border (``_ssim_cly``, :192-232).  (The
*published* numbers use the simpler scipy-gaussian SSIM in
``shiftnet_tpu/eval/metrics.py``; these are the config-driven validation
metrics.)
"""
from __future__ import annotations

import numpy as np

from shiftnet_tpu.eval.color import reorder_image, to_y_channel


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    # matches cv2.getGaussianKernel(11, 1.5) outer product
    x = np.arange(size) - (size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k /= k.sum()
    return np.outer(k, k)


def calculate_psnr(img1, img2, crop_border: int = 0, input_order: str = 'HWC',
                   test_y_channel: bool = False) -> float:
    assert img1.shape == img2.shape, (img1.shape, img2.shape)
    img1 = reorder_image(np.asarray(img1), input_order).astype(np.float64)
    img2 = reorder_image(np.asarray(img2), input_order).astype(np.float64)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img1 = to_y_channel(img1)
        img2 = to_y_channel(img2)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float('inf')
    max_value = 1.0 if img1.max() <= 1 else 255.0
    return float(20.0 * np.log10(max_value / np.sqrt(mse)))


def _ssim_map(img1, img2, filt, c1, c2):
    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(img1 ** 2) - mu1_sq
    s2 = filt(img2 ** 2) - mu2_sq
    s12 = filt(img1 * img2) - mu1_mu2
    return ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))


def _gaussian_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def _ssim_y(img1: np.ndarray, img2: np.ndarray) -> float:
    """Y-channel SSIM: 2D 11x11 gaussian, replicate border, full-map mean
    (reference ``_ssim_cly``, ``psnr_ssim.py:192-232``)."""
    from scipy.ndimage import correlate

    win = _gaussian_window()
    # scipy mode='nearest' == cv2 BORDER_REPLICATE
    filt = lambda x: correlate(x.astype(np.float64), win, mode='nearest')
    return float(np.mean(_ssim_map(img1.astype(np.float64),
                                   img2.astype(np.float64), filt,
                                   (0.01 * 255) ** 2, (0.03 * 255) ** 2)))


def _ssim_3d(img1: np.ndarray, img2: np.ndarray, max_value: float) -> float:
    """Color SSIM: separable 11^3 gaussian over (H, W, C), replicate padding
    (reference ``_ssim_3d``, ``psnr_ssim.py:151-190``; computed in float32
    there via torch conv3d — float32 here too for exact parity)."""
    from scipy.ndimage import correlate

    k1 = _gaussian_1d()
    kernel3 = k1[:, None, None] * k1[None, :, None] * k1[None, None, :]
    filt = lambda x: correlate(x.astype(np.float32), kernel3.astype(np.float32),
                               mode='nearest')
    return float(np.mean(_ssim_map(img1.astype(np.float32),
                                   img2.astype(np.float32), filt,
                                   (0.01 * max_value) ** 2,
                                   (0.03 * max_value) ** 2)))


def calculate_ssim(img1, img2, crop_border: int = 0, input_order: str = 'HWC',
                   test_y_channel: bool = False) -> float:
    assert img1.shape == img2.shape, (img1.shape, img2.shape)
    img1 = reorder_image(np.asarray(img1), input_order).astype(np.float64)
    img2 = reorder_image(np.asarray(img2), input_order).astype(np.float64)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img1 = to_y_channel(img1)
        img2 = to_y_channel(img2)
        return _ssim_y(img1[..., 0], img2[..., 0])
    max_value = 1 if img1.max() <= 1 else 255
    return _ssim_3d(img1, img2, max_value)
