"""Grid tiling + TTA tests: identity round-trip and reference stride logic."""
import numpy as np

from shiftnet_tpu.eval.grids import (extract_grids, merge_grids, plan_grids,
                                     transpose_fwd, transpose_inv)


def test_transpose_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    for t in range(8):
        y = transpose_fwd(x, t)
        back = transpose_inv(y, t)
        np.testing.assert_array_equal(back, x)


def test_plan_covers_frame():
    for h, w, c in [(100, 130, 48), (256, 256, 256), (97, 53, 32)]:
        plans = plan_grids(h, w, c)
        cover = np.zeros((h, w), np.int32)
        for p in plans:
            assert 0 <= p.i <= h - c and 0 <= p.j <= w - c
            cover[p.i:p.i + c, p.j:p.j + c] += 1
        assert (cover >= 1).all(), (h, w, c)


def test_identity_model_roundtrip_with_tta():
    rng = np.random.default_rng(1)
    clip = rng.uniform(0, 1, (3, 70, 90, 3)).astype(np.float32)
    crop = 32
    plans = plan_grids(70, 90, crop, trans_num=8)
    parts = extract_grids(clip, plans, crop)
    # identity "model": prediction == input crop
    merged = merge_grids(parts, plans, clip.shape, crop)
    np.testing.assert_allclose(merged, clip, atol=1e-6)
