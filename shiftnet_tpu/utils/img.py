"""Image utilities (surface parity with ``basicsr/utils/img_util.py``).

numpy-first equivalents: tensor<->image conversion for our NHWC float
convention, reflect padding to a size multiple, border cropping, and
read/write helpers.
"""
from __future__ import annotations

import os

import numpy as np


def img2tensor(img: np.ndarray, bgr2rgb: bool = False,
               float32: bool = True) -> np.ndarray:
    """HWC uint8/float image -> (H, W, C) float array in [0, 1]
    (reference ``img_util.py:15`` returns CHW torch; NHWC is our layout)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if bgr2rgb and img.shape[-1] == 3:
        img = img[..., ::-1]
    out = img.astype(np.float32)
    if img.dtype == np.uint8:
        out = out / 255.0
    return out if float32 else out.astype(np.float64)


def tensor2img(tensor, rgb2bgr: bool = False, min_max=(0, 1)) -> np.ndarray:
    """(..., H, W, C) float array -> HWC uint8 image(s)
    (reference ``img_util.py:42``): clamp to min_max, rescale, round."""
    arr = np.asarray(tensor, dtype=np.float32)
    lo, hi = min_max
    arr = np.clip(arr, lo, hi)
    arr = (arr - lo) / (hi - lo)
    if rgb2bgr and arr.shape[-1] == 3:
        arr = arr[..., ::-1]
    return (arr * 255.0).round().astype(np.uint8)


def padding(img: np.ndarray, gt_size: int) -> np.ndarray:
    """Reflect-pad H/W up to at least ``gt_size``
    (reference ``img_util.py:133-146``)."""
    h, w = img.shape[:2]
    pad_h = max(0, gt_size - h)
    pad_w = max(0, gt_size - w)
    if not pad_h and not pad_w:
        return img
    pads = ((0, pad_h), (0, pad_w)) + ((0, 0),) * (img.ndim - 2)
    return np.pad(img, pads, mode='reflect')


def pad_to_multiple(img: np.ndarray, mode: int = 8) -> tuple[np.ndarray, tuple[int, int]]:
    """Reflect-pad H/W up to multiples of ``mode`` (clean alternative to the
    reference's ad-hoc mod-crops); returns (padded, (pad_h, pad_w))."""
    h, w = img.shape[-3], img.shape[-2]
    ph = (-h) % mode
    pw = (-w) % mode
    if not ph and not pw:
        return img, (0, 0)
    pads = ((0, 0),) * (img.ndim - 3) + ((0, ph), (0, pw), (0, 0))
    return np.pad(img, pads, mode='reflect'), (ph, pw)


def crop_border(imgs, crop: int):
    """Crop ``crop`` pixels from each H/W edge (reference ``img_util.py:166``)."""
    if crop == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[..., crop:-crop, crop:-crop, :] for v in imgs]
    return imgs[..., crop:-crop, crop:-crop, :]


def imwrite(path: str, img: np.ndarray, auto_mkdir: bool = True) -> None:
    """Write a uint8 HWC image (reference ``img_util.py:147``)."""
    import imageio.v2 as imageio
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.imwrite(path, img)
