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


def test_forward_grids_full_crop_matches_direct():
    """Evaluator.forward_grids with a frame-covering crop and identity
    transform must equal the direct model forward (the validation wiring
    end-to-end, minus tiling effects)."""
    import jax
    import jax.numpy as jnp
    from shiftnet_tpu.eval.runner import Evaluator
    from shiftnet_tpu.models import build_model, init_params

    cpu = jax.devices('cpu')[0]
    jax.config.update('jax_default_device', cpu)
    try:
        tiny = dict(n_feats0=8, n_feats2=16, num_orbs=1, tfr_scale=4,
                    shift_rounds=1, encoder2_levels=2)
        halo = 1
        model = build_model('deblur_small', past_frames=halo,
                            future_frames=halo, **tiny)
        rng = np.random.default_rng(5)
        clip = rng.uniform(0, 1, (4, 24, 24, 3)).astype(np.float32)
        params = init_params(model, jnp.asarray(clip))
        want = np.asarray(model.apply({'params': params},
                                      jnp.asarray(clip)), np.float32)

        ev = Evaluator.__new__(Evaluator)  # skip logger/file setup
        ev.cfg = model.cfg
        ev.halo = halo
        ev.model = model
        ev.params = params
        ev.dtype = jnp.float32
        ev._jit_cache = {}
        got = ev.forward_grids(clip, crop_size=64, trans_num=1)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

        # 8-transform TTA through the same path: finite, right shape
        tta = ev.forward_grids(clip, crop_size=8, trans_num=8)
        assert tta.shape == want.shape
        assert np.isfinite(tta).all()
    finally:
        jax.config.update('jax_default_device', None)


def test_identity_model_roundtrip_with_tta():
    rng = np.random.default_rng(1)
    clip = rng.uniform(0, 1, (3, 70, 90, 3)).astype(np.float32)
    crop = 32
    plans = plan_grids(70, 90, crop, trans_num=8)
    parts = extract_grids(clip, plans, crop)
    # identity "model": prediction == input crop
    merged = merge_grids(parts, plans, clip.shape, crop)
    np.testing.assert_allclose(merged, clip, atol=1e-6)
