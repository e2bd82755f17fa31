"""Loss parity: Loss2 spec parsing, HEM semantics vs the reference algorithm."""
import numpy as np
import jax
import jax.numpy as jnp

from shiftnet_tpu.train.optim import build_loss, hem_loss, l1_loss, psnr_loss


def _ref_hem(x, y, hard_thre_p=0.5):
    """numpy reimplementation of hard_example_mining.py:14-47 (no random)."""
    # x, y: (B, H, W, C)
    b, h, w, c = x.shape
    res = np.abs(x - y).sum(axis=-1)                  # (B, H, W)
    mask = np.zeros((b, h, w), np.float32)
    k = int(0.5 * h * w)
    for i in range(b):
        thre = np.sort(res[i].reshape(-1))[::-1][k]
        mask[i] = (res[i] > thre).astype(np.float32)
    return np.mean(np.abs(x - y) * mask[..., None])


def test_hem_matches_reference_deterministic():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 8, 10, 3)).astype(np.float32)
    y = rng.standard_normal((3, 8, 10, 3)).astype(np.float32)
    got = float(hem_loss(jnp.asarray(x), jnp.asarray(y), rng=None))
    want = _ref_hem(x, y)
    assert abs(got - want) < 1e-6


def test_hem_random_mask_count():
    x = np.zeros((2, 16, 16, 3), np.float32)
    y = np.ones((2, 16, 16, 3), np.float32)
    # exactly-uniform residual -> hard mask empty (strictly-greater rule)
    loss0 = float(hem_loss(jnp.asarray(x), jnp.asarray(y), rng=None))
    assert loss0 == 0.0  # no pixel strictly exceeds the threshold
    loss_r = float(hem_loss(jnp.asarray(x), jnp.asarray(y),
                            rng=jax.random.PRNGKey(0)))
    # exactly int(0.1*256)=25 of 256 pixels masked, residual 1 everywhere
    assert abs(loss_r - 25 / 256) < 1e-6


def test_loss2_spec():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    combo = build_loss('1*L1+2*PSNR')
    want = l1_loss(x, y) + 2 * psnr_loss(x, y)
    assert abs(float(combo(x, y)) - float(want)) < 1e-6
    assert abs(float(build_loss('1*L1')(x, y)) - float(l1_loss(x, y))) < 1e-7
