"""NIQE — Natural Image Quality Evaluator (no-reference metric).

Surface parity with the reference ``basicsr/metrics/niqe.py``: MSCN
normalization, AGGD feature fits over 96x96 blocks at two scales, Mahalanobis
distance to a pristine multivariate Gaussian.  The pristine-model statistics
(``niqe_pris_params.npz``, public data from the official NIQE release) are
vendored in ``eval/data/``; override via ``SHIFTNET_NIQE_PARAMS`` or
``params_path``.
"""
from __future__ import annotations

import math
import os

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma as _gamma

from shiftnet_tpu.eval.color import reorder_image, to_y_channel

_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = np.square(_gamma(2.0 / _GAM)) / (_gamma(1.0 / _GAM) * _gamma(3.0 / _GAM))


def estimate_aggd_param(block: np.ndarray) -> tuple[float, float, float]:
    """Fit an asymmetric generalized gaussian to the block coefficients."""
    block = block.flatten()
    left_std = np.sqrt(np.mean(block[block < 0] ** 2))
    right_std = np.sqrt(np.mean(block[block > 0] ** 2))
    gammahat = left_std / right_std
    rhat = (np.mean(np.abs(block))) ** 2 / np.mean(block ** 2)
    rhatnorm = (rhat * (gammahat ** 3 + 1) * (gammahat + 1)) / (
        (gammahat ** 2 + 1) ** 2)
    alpha = _GAM[np.argmin((_R_GAM - rhatnorm) ** 2)]
    ratio = np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    return alpha, left_std * ratio, right_std * ratio


def _block_features(block: np.ndarray) -> list[float]:
    feat = []
    alpha, bl, br = estimate_aggd_param(block)
    feat += [alpha, (bl + br) / 2]
    for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
        pair = block * np.roll(block, shift, axis=(0, 1))
        alpha, bl, br = estimate_aggd_param(pair)
        mean = (br - bl) * (_gamma(2 / alpha) / _gamma(1 / alpha))
        feat += [alpha, mean, bl, br]
    return feat


def niqe_core(img: np.ndarray, mu_pris: np.ndarray, cov_pris: np.ndarray,
              gaussian_window: np.ndarray, block: int = 96) -> float:
    """NIQE on a grayscale/Y image in [0, 255] float, shape (H, W)."""
    import cv2

    h, w = img.shape
    nbh, nbw = math.floor(h / block), math.floor(w / block)
    img = img[: nbh * block, : nbw * block]

    feats = []
    for scale in (1, 2):
        mu = convolve(img, gaussian_window, mode='nearest')
        sigma = np.sqrt(np.abs(
            convolve(np.square(img), gaussian_window, mode='nearest') - mu ** 2))
        normalized = (img - mu) / (sigma + 1)
        scale_feats = []
        for iw in range(nbw):
            for ih in range(nbh):
                b = normalized[ih * block // scale:(ih + 1) * block // scale,
                               iw * block // scale:(iw + 1) * block // scale]
                scale_feats.append(_block_features(b))
        feats.append(np.array(scale_feats))
        if scale == 1:
            hh, ww = img.shape
            img = cv2.resize(img / 255.0, (ww // 2, hh // 2),
                             interpolation=cv2.INTER_LINEAR) * 255.0

    feats = np.concatenate(feats, axis=1)
    mu_dist = np.nanmean(feats, axis=0)
    cov_dist = np.cov(feats[~np.isnan(feats).any(axis=1)], rowvar=False)
    invcov = np.linalg.pinv((cov_pris + cov_dist) / 2)
    d = np.asarray(mu_pris - mu_dist).reshape(-1)
    return float(np.sqrt(d @ invcov @ d))


_VENDORED = os.path.join(os.path.dirname(__file__), 'data',
                         'niqe_pris_params.npz')


def load_pris_params(params_path: str | None = None):
    """Pristine-model statistics (mu/cov/window) from the official NIQE
    release — vendored data file, overridable via SHIFTNET_NIQE_PARAMS."""
    path = params_path or os.environ.get('SHIFTNET_NIQE_PARAMS', _VENDORED)
    if not os.path.exists(path):
        raise FileNotFoundError(
            'NIQE pristine-model statistics not found; set '
            'SHIFTNET_NIQE_PARAMS to a niqe_pris_params.npz from the official '
            f'NIQE release (tried {path})')
    data = np.load(path)
    return (data['mu_pris_param'], data['cov_pris_param'],
            data['gaussian_window'])


def calculate_niqe(img: np.ndarray, crop_border: int = 0,
                   input_order: str = 'HWC', convert_to: str = 'y',
                   params_path: str | None = None) -> float:
    """Reference ``calculate_niqe`` (``niqe.py:164-211``)."""
    mu_pris, cov_pris, window = load_pris_params(params_path)
    img = np.asarray(img).astype(np.float32)
    if input_order != 'HW':
        img = reorder_image(img, input_order)
        if convert_to == 'y':
            img = to_y_channel(img)
        elif convert_to == 'gray':
            import cv2
            img = cv2.cvtColor(img / 255.0, cv2.COLOR_BGR2GRAY) * 255.0
        img = np.squeeze(img)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return niqe_core(img, mu_pris, cov_pris, window)
