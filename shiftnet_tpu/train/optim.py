"""Optimizer / scheduler / loss construction.

Reference recipe (``basicsr/models/image_restoration_model.py:112-141``,
``options/gopro_deblur.yml:59-72``): AdamW lr 4e-4, betas (0.9, 0.99),
weight_decay 0, cosine anneal to 1e-7 over total_iter, global-norm grad clip
(0.01 deblur / 0.04 denoise-big — ``image_restoration1_model.py:313``,
``image_restoration3_model.py:297``), plus per-group LR multipliers (1.5x for
``stage1.decoder_level*`` in the denoise-big finetune recipe,
``image_restoration3_model.py:116-125``).

Losses: ``Loss2`` spec strings ("1*L1", "1*L1+2*HEM") from
``basicsr/loss/__init__.py:104-170`` and hard-example-mining L1 from
``basicsr/loss/hard_example_mining.py:14-47``.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class OptimConfig:
    lr: float = 4e-4
    betas: tuple[float, float] = (0.9, 0.99)
    weight_decay: float = 0.0
    eps: float = 1e-8
    total_iters: int = 300_000
    eta_min: float = 1e-7
    scheduler_kind: str = 'cosine'
    scheduler_kwargs: dict = dataclasses.field(default_factory=dict)
    warmup_iter: int = -1
    grad_clip: float | None = 0.01
    # path-regex -> lr multiplier, e.g. {r'stage1/decoder_level': 1.5}
    lr_group_scales: dict[str, float] = dataclasses.field(default_factory=dict)


def cosine_lr(cfg: OptimConfig) -> optax.Schedule:
    """The configured schedule (default: torch CosineAnnealingLR)."""
    from shiftnet_tpu.train.schedulers import build_schedule
    return build_schedule(cfg.scheduler_kind, cfg.lr, cfg.total_iters,
                          eta_min=cfg.eta_min, warmup_iter=cfg.warmup_iter,
                          **cfg.scheduler_kwargs)


def _group_scale_mask(params, scales: dict[str, float]):
    """Label each leaf by the first matching path regex ('' = default)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        s = '/'.join(getattr(p, 'key', str(p)) for p in path)
        for pat in scales:
            if re.search(pat, s):
                return pat
        return ''

    labels = jax.tree_util.tree_map_with_path(lambda p, _: label_of(p), params)
    del flat
    return labels


def build_optimizer(cfg: OptimConfig, params=None) -> optax.GradientTransformation:
    sched = cosine_lr(cfg)

    def adamw(scale: float):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(
                (lambda s: sched(s) * scale) if scale != 1.0 else sched),
        )

    tx_parts = []
    if cfg.grad_clip is not None:
        tx_parts.append(optax.clip_by_global_norm(cfg.grad_clip))

    if cfg.lr_group_scales:
        assert params is not None, 'params needed to resolve lr groups'
        labels = _group_scale_mask(params, cfg.lr_group_scales)
        transforms = {'': adamw(1.0)}
        for pat, scale in cfg.lr_group_scales.items():
            transforms[pat] = adamw(scale)
        tx_parts.append(optax.multi_transform(transforms, labels))
    else:
        tx_parts.append(adamw(1.0))
    return optax.chain(*tx_parts)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def psnr_loss(pred, target):
    """``PSNRLoss`` (``basicsr/models/losses/losses.py:90-115``):
    0.5 * (10/ln10) * log(mean((p-t)^2) + 1e-8), minimized."""
    scale = 10.0 / jnp.log(10.0)
    return 0.5 * scale * jnp.log(jnp.mean(jnp.square(pred - target)) + 1e-8)


def hem_loss(pred, target, *, hard_thre_p: float = 0.5, random_thre_p: float = 0.1,
             rng: jax.Array | None = None):
    """Hard-example-mining L1 (``basicsr/loss/hard_example_mining.py:14-47``).

    Reference semantics: the per-PIXEL residual (|x-y| summed over channels)
    is thresholded at the value ranked ``hard_thre_p*h*w`` (descending,
    strictly greater), an exactly-``random_thre_p*h*w``-pixel random mask is
    OR-ed in, and the loss is the plain mean of |x-y| * mask over ALL
    elements (nn.L1Loss on masked tensors).  pred/target: (..., H, W, C);
    leading dims are the mask batch (frames-as-batch in the reference).
    """
    err = jnp.abs(pred - target)
    h, w, c = pred.shape[-3:]
    res = jnp.sum(err, axis=-1)                       # (..., H, W)
    flat = res.reshape(-1, h * w)
    k = int(hard_thre_p * h * w)
    sorted_desc = -jnp.sort(-flat, axis=1)
    thre = sorted_desc[:, k]
    mask = flat > thre[:, None]
    if rng is not None and random_thre_p > 0:
        k2 = int(random_thre_p * h * w)
        if k2 > 0:
            rand = jax.random.uniform(rng, flat.shape)
            cutoff = jnp.sort(rand, axis=1)[:, k2 - 1]
            mask = mask | (rand <= cutoff[:, None])
    mask = mask.astype(err.dtype).reshape(res.shape)[..., None]
    return jnp.mean(err * mask)


_LOSS_FNS: dict[str, Callable] = {
    'L1': l1_loss, 'MSE': mse_loss, 'L2': mse_loss, 'PSNR': psnr_loss,
    'HEM': hem_loss,
}


def build_loss(spec: str) -> Callable:
    """Parse a ``Loss2`` spec string like ``"1*L1"`` or ``"1*L1+2*HEM"``
    (``basicsr/loss/__init__.py:104-170``) into a callable(pred, target, rng)."""
    terms = []
    for part in spec.split('+'):
        weight, name = part.split('*')
        terms.append((float(weight), name.strip(), _LOSS_FNS[name.strip()]))

    def loss_fn(pred, target, rng=None):
        total = 0.0
        for w, name, fn in terms:
            if name == 'HEM':
                total += w * fn(pred, target, rng=rng)
            else:
                total += w * fn(pred, target)
        return total

    return loss_fn
