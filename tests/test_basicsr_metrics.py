"""Golden parity for the config-driven metric family (color conversion,
crop-border/Y-channel PSNR, 3D/Y SSIM) vs the reference implementations."""
import numpy as np

from shiftnet_tpu.eval.basicsr_metrics import calculate_psnr, calculate_ssim
from shiftnet_tpu.eval.color import bgr2ycbcr, rgb2ycbcr
from conftest import load_fixture


def test_rgb2ycbcr():
    fx = load_fixture('metrics_basicsr')
    img = fx['img'] / 255.0
    np.testing.assert_allclose(rgb2ycbcr(img, y_only=True), fx['rgb2y'],
                               atol=1e-5)
    np.testing.assert_allclose(rgb2ycbcr(img), fx['rgb2ycbcr'], atol=1e-5)
    np.testing.assert_allclose(bgr2ycbcr(img, y_only=True), fx['bgr2y'],
                               atol=1e-5)


def test_calculate_psnr():
    fx = load_fixture('metrics_basicsr')
    got = calculate_psnr(fx['img'], fx['img2'], crop_border=4)
    assert abs(got - float(fx['psnr_cb4'])) < 1e-8
    got = calculate_psnr(fx['img'], fx['img2'], crop_border=0,
                         test_y_channel=True)
    assert abs(got - float(fx['psnr_y'])) < 1e-6


def test_calculate_ssim_3d():
    fx = load_fixture('metrics_basicsr')
    got = calculate_ssim(fx['img'], fx['img2'], crop_border=0)
    assert abs(got - float(fx['ssim_cb0'])) < 2e-5


def test_calculate_ssim_y():
    fx = load_fixture('metrics_basicsr')
    got = calculate_ssim(fx['img'], fx['img2'], crop_border=4,
                         test_y_channel=True)
    assert abs(got - float(fx['ssim_y'])) < 1e-6


def test_imresize_matlab():
    from shiftnet_tpu.eval.imresize import imresize
    fx = load_fixture('metrics_basicsr')
    got = imresize(fx['resize_in'], 0.5, True)
    np.testing.assert_allclose(got, fx['resize_half'], atol=5e-6)
    got = imresize(fx['resize_in'], 2.0, True)
    np.testing.assert_allclose(got, fx['resize_2x'], atol=5e-6)
