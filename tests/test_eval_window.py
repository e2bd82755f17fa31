"""Window / tiling planning parity with the reference protocols."""
import numpy as np

from shiftnet_tpu.eval.window import (plan_deblur_chunks, plan_denoise_chunks,
                                      quadrant_pads, quadrant_slices)


def test_deblur_chunks_match_reference_indexing():
    # test_deblur.py:111-120: in = frames[k*L : k*L+L+4], out-gt = [k*L+2 ...]
    n, L = 100, 24
    chunks = plan_deblur_chunks(n, L, 2)
    assert len(chunks) == (n - 4) // L
    for k, ch in enumerate(chunks):
        assert ch.in_start == k * L
        assert ch.in_stop == k * L + L + 4
        assert ch.out_start == k * L + 2
        assert ch.out_stop == k * L + 2 + L
    # predicted frames are contiguous
    outs = [f for ch in chunks for f in range(ch.out_start, ch.out_stop)]
    assert outs == list(range(2, 2 + len(chunks) * L))


def test_denoise_chunks_residual_absorbed():
    # test_denoise.py:115-133: one_len = T-4, halved if >100, last chunk
    # takes the residual.
    for n in (40, 85, 230, 231):
        chunks = plan_denoise_chunks(n, 2)
        outs = [f for ch in chunks for f in range(ch.out_start, ch.out_stop)]
        assert outs == list(range(2, n - 2)), n
        for ch in chunks:
            assert ch.in_stop - ch.in_start == (ch.out_stop - ch.out_start) + 4


def test_quadrant_tiling_covers_exactly():
    h, w = 480, 852  # mod-4 cropped SD resolution from the reference comments
    ph, pw = quadrant_pads(h, w)
    assert (h // 2 + ph) % 16 == 0
    assert (w // 2 + pw) % 16 == 0
    canvas = np.zeros((h, w), np.int32)
    for in_sl, crop_sl, out_sl in quadrant_slices(h, w):
        tile = np.zeros((h, w), np.int32)[in_sl]
        assert tile.shape == (h // 2 + ph, w // 2 + pw)
        canvas[out_sl] += 1
        # tile crop must match the output slot size
        sub = np.zeros(tile.shape, np.int32)[crop_sl]
        assert sub.shape == canvas[out_sl].shape
    assert (canvas == 1).all()


def test_quadrant_stitch_identity():
    """Stitching tiles of the identity function reproduces the image."""
    rng = np.random.default_rng(0)
    h, w = 64, 96
    img = rng.standard_normal((5, h, w, 3)).astype(np.float32)
    out = np.zeros_like(img)
    for in_sl, crop_sl, out_sl in quadrant_slices(h, w):
        tile = img[:, in_sl[0], in_sl[1]]
        out[:, out_sl[0], out_sl[1]] = tile[:, crop_sl[0], crop_sl[1]]
    np.testing.assert_array_equal(out, img)


def test_half_tiles_cover_exactly():
    from shiftnet_tpu.eval.window import half_slices
    h, w = 720, 1280
    canvas = np.zeros((h, w), np.int32)
    for in_sl, crop_sl, out_sl in half_slices(h, w):
        tile = np.zeros((h, w), np.int32)[in_sl]
        assert tile.shape[0] % 16 == 0
        sub = np.zeros(tile.shape, np.int32)[crop_sl]
        assert sub.shape == canvas[out_sl].shape
        canvas[out_sl] += 1
    assert (canvas == 1).all()


def test_half_tiles_stitch_identity():
    from shiftnet_tpu.eval.window import half_slices
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 64, 96, 3)).astype(np.float32)
    out = np.zeros_like(img)
    for in_sl, crop_sl, out_sl in half_slices(64, 96):
        tile = img[:, in_sl[0], in_sl[1]]
        out[:, out_sl[0], out_sl[1]] = tile[:, crop_sl[0], crop_sl[1]]
    np.testing.assert_array_equal(out, img)


def test_evaluator_precision_protocol_defaults(tmp_path):
    """Precision protocol (PERF.md round-5): deblur defaults to bf16
    (measured 52 dB drift, ~0.02 dB PSNR impact); BOTH denoise variants
    default to f32 — bf16's 8-bit significand drifts 28 dB at sigma=10,
    parity-breaking at the ~40 dB DAVIS targets (the reference's fp16 has
    11 bits and is NOT the same precision class as bf16)."""
    import jax.numpy as jnp
    from shiftnet_tpu.eval.runner import Evaluator
    for variant, want in [('deblur_plus', jnp.bfloat16),
                          ('deblur_small', jnp.bfloat16),
                          ('denoise_plus', jnp.float32),
                          ('denoise_small', jnp.float32)]:
        ev = Evaluator(variant, None, result_path=str(tmp_path))
        assert ev.dtype == want, variant
        # fused packed-CHW inference is the default at BOTH precisions
        # (round 5: f32 kernels viable once the VMEM limit is raised —
        # denoise 480p f32 1.701 -> 5.712 fps)
        assert ev.cfg.fused_chw, variant
