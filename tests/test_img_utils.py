"""Image utility round-trips."""
import numpy as np

from shiftnet_tpu.utils.img import (crop_border, img2tensor, pad_to_multiple,
                                    padding, tensor2img)


def test_img_tensor_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (12, 10, 3), dtype=np.uint8)
    t = img2tensor(img)
    assert t.dtype == np.float32 and t.max() <= 1.0
    back = tensor2img(t)
    np.testing.assert_array_equal(back, img)


def test_padding_reflect():
    img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    out = padding(img, 6)
    assert out.shape == (6, 6, 1)
    np.testing.assert_array_equal(out[:3, :4], img)
    # reflect: row 3 == row 1 (reflection around the last row)
    np.testing.assert_array_equal(out[3, :4, 0], img[1, :, 0])


def test_pad_to_multiple_and_crop():
    rng = np.random.default_rng(1)
    clip = rng.standard_normal((2, 13, 21, 3)).astype(np.float32)
    padded, (ph, pw) = pad_to_multiple(clip, 8)
    assert padded.shape == (2, 16, 24, 3) and (ph, pw) == (3, 3)
    np.testing.assert_array_equal(padded[:, :13, :21], clip)
    cropped = crop_border(clip, 2)
    assert cropped.shape == (2, 9, 17, 3)
