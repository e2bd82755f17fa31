"""Golden tests for the shift / resize / norm primitives vs the reference.

Fixtures are produced by ``tests/gen_fixtures.py`` from the reference PyTorch
code (NCHW); we transpose to our NHWC layout here.
"""
import numpy as np
import jax.numpy as jnp

from shiftnet_tpu.ops import (
    bilinear_up2x, gsts, grouped_spatial_shift, layer_norm_2d, pixel_shuffle,
    temporal_channel_shift,
)
from conftest import load_fixture


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


class TestGSTSBig:
    """number=5 (n_feat=80), boundary-patched (gshift_deblur1.py:504-528)."""

    def test_forward(self):
        fx = load_fixture('ops_shift_big')
        x = jnp.asarray(nchw_to_nhwc(fx['x']))
        got = gsts(x, number=5, reverse=False, boundary_patch=True)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), fx['fwd'],
                                   atol=0, rtol=0)

    def test_reverse(self):
        fx = load_fixture('ops_shift_big')
        x = jnp.asarray(nchw_to_nhwc(fx['x']))
        got = gsts(x, number=5, reverse=True, boundary_patch=True)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), fx['rev'],
                                   atol=0, rtol=0)

    def test_spatial_shift(self):
        fx = load_fixture('ops_shift_big')
        hw = jnp.asarray(nchw_to_nhwc(fx['sp_in']))
        got = grouped_spatial_shift(hw, number=5)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), fx['sp_out'],
                                   atol=0, rtol=0)


class TestGSTSSmall:
    """number=4 (n_feat=64), pure circular roll (gshift_deblur2.py:496-512)."""

    def test_forward(self):
        fx = load_fixture('ops_shift_small')
        x = jnp.asarray(nchw_to_nhwc(fx['x']))
        got = gsts(x, number=4, reverse=False, boundary_patch=False)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), fx['fwd'],
                                   atol=0, rtol=0)

    def test_reverse(self):
        fx = load_fixture('ops_shift_small')
        x = jnp.asarray(nchw_to_nhwc(fx['x']))
        got = gsts(x, number=4, reverse=True, boundary_patch=False)
        np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), fx['rev'],
                                   atol=0, rtol=0)


class TestTemporalShift:
    def test_forward_semantics(self):
        t, c = 4, 8
        x = np.arange(t * 2 * 2 * c, dtype=np.float32).reshape(t, 2, 2, c)
        y = np.asarray(temporal_channel_shift(jnp.asarray(x)))
        # frame 0 untouched
        np.testing.assert_array_equal(y[0], x[0])
        for tt in range(1, t):
            np.testing.assert_array_equal(y[tt, ..., : c // 2],
                                          x[tt - 1, ..., c // 2:])
            np.testing.assert_array_equal(y[tt, ..., c // 2:],
                                          x[tt, ..., : c // 2])

    def test_reverse_semantics(self):
        t, c = 4, 8
        x = np.arange(t * 2 * 2 * c, dtype=np.float32).reshape(t, 2, 2, c)
        y = np.asarray(temporal_channel_shift(jnp.asarray(x), reverse=True))
        np.testing.assert_array_equal(y[-1], x[-1])
        for tt in range(t - 1):
            np.testing.assert_array_equal(y[tt, ..., : c // 2],
                                          x[tt, ..., c // 2:])
            np.testing.assert_array_equal(y[tt, ..., c // 2:],
                                          x[tt + 1, ..., : c // 2])


class TestResize:
    def test_bilinear_up2x(self):
        fx = load_fixture('ops_resize')
        x = jnp.asarray(nchw_to_nhwc(fx['up_in']))
        got = nhwc_to_nchw(np.asarray(bilinear_up2x(x)))
        np.testing.assert_allclose(got, fx['up_out'], atol=1e-6)

    def test_pixel_shuffle(self):
        fx = load_fixture('ops_resize')
        x = jnp.asarray(nchw_to_nhwc(fx['ps_in']))
        got = nhwc_to_nchw(np.asarray(pixel_shuffle(x, 2)))
        np.testing.assert_allclose(got, fx['ps_out'], atol=0, rtol=0)


class TestLayerNorm2d:
    def test_matches_manual(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 4, 5, 16)).astype(np.float32)
        w = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal(16).astype(np.float32)
        got = np.asarray(layer_norm_2d(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b)))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        want = (x - mu) / np.sqrt(var + 1e-6) * w + b
        np.testing.assert_allclose(got, want, atol=1e-5)
