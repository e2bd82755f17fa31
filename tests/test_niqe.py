"""NIQE golden test vs the reference implementation's recorded output.

The golden value was produced by running the reference
``basicsr/metrics/niqe.py`` ``calculate_niqe`` (with the same vendored
``niqe_pris_params.npz``) on the synthetic image below.
"""
import numpy as np

from shiftnet_tpu.eval.niqe import calculate_niqe, load_pris_params

GOLDEN = 19.024456919250227


def _synthetic_image():
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:128, 0:160]
    img = (128 + 60 * np.sin(yy / 7.0) * np.cos(xx / 11.0)
           + rng.normal(0, 12, (128, 160)))
    img = np.clip(img, 0, 255).astype(np.float32)
    return np.stack([img, img * 0.9, img * 0.8], axis=-1)


def test_pris_params_vendored():
    mu, cov, window = load_pris_params()
    assert mu.shape == (1, 36)
    assert cov.shape == (36, 36)
    assert window.shape == (7, 7)


def test_niqe_matches_reference():
    v = calculate_niqe(_synthetic_image(), crop_border=0,
                       input_order='HWC', convert_to='y')
    assert abs(v - GOLDEN) < 5e-3, (v, GOLDEN)
