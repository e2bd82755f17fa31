"""LR schedules as pure step->lr functions (optax-compatible).

Covers the reference scheduler family (``basicsr/models/lr_scheduler.py`` +
torch CosineAnnealingLR as used via ``TrueCosineAnnealingLR``,
``base_model.py:82-113``) plus the linear warmup of
``base_model.py:163-185``.  All are host-side pure functions of the step so
they compose with ``optax.scale_by_learning_rate`` and stay jittable.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable


def true_cosine_annealing(lr: float, t_max: int, eta_min: float = 0.0) -> Schedule:
    """torch ``CosineAnnealingLR`` (closed form)."""
    def fn(step):
        t = jnp.minimum(step, t_max)
        return eta_min + (lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t / t_max))
    return fn


def cosine_annealing_restart(lr: float, periods: Sequence[int],
                             restart_weights: Sequence[float] = (1,),
                             eta_min: float = 0.0) -> Schedule:
    """``CosineAnnealingRestartLR`` (``lr_scheduler.py:140-185``)."""
    assert len(periods) == len(restart_weights)
    cum = [sum(periods[:i + 1]) for i in range(len(periods))]

    def fn(step):
        out = None
        prev = 0
        for period, weight, bound in zip(periods, restart_weights, cum):
            t = jnp.clip(step - prev, 0, period)
            val = eta_min + weight * 0.5 * (lr - eta_min) * (
                1 + jnp.cos(jnp.pi * t / period))
            out = val if out is None else jnp.where(step > prev - 1, val, out)
            prev = bound
        return out

    return fn


def multi_step_restart(lr: float, milestones: Sequence[int],
                       gamma: float = 0.1,
                       restarts: Sequence[int] = (0,),
                       restart_weights: Sequence[float] = (1,)) -> Schedule:
    """``MultiStepRestartLR`` (``lr_scheduler.py:12-52``): step decay by
    ``gamma`` at each milestone, reset to ``weight * lr`` at restarts."""
    assert len(restarts) == len(restart_weights)

    def fn(step):
        # weight from the most recent restart (restarts are step indices)
        val = jnp.asarray(lr, jnp.float32)
        base = jnp.asarray(1.0, jnp.float32)
        for r, w in zip(restarts, restart_weights):
            base = jnp.where(step >= r, w, base)
        decay = jnp.asarray(0, jnp.int32)
        last_restart = jnp.asarray(0, jnp.int32)
        for r in restarts:
            last_restart = jnp.where(step >= r, r, last_restart)
        for m in milestones:
            decay = decay + jnp.where((step >= m) & (m > last_restart), 1, 0)
        return val * base * gamma ** decay

    return fn


def linear_decay(lr: float, total_iter: int) -> Schedule:
    """``LinearLR`` (``lr_scheduler.py:54-76``)."""
    def fn(step):
        return lr * (1.0 - step / total_iter)
    return fn


def vibrate(lr: float, total_iter: int) -> Schedule:
    """``VibrateLR`` (``lr_scheduler.py:78-117``): triangular oscillation
    under a piecewise-decaying envelope."""
    T = total_iter // 80
    Th = T // 2

    def fn(step):
        process = step / total_iter
        f = jnp.where(process < 3 / 8, 1 - process * 8 / 3,
                      jnp.where(process < 5 / 8, 0.2, 0.1))
        t = step % T
        f2 = t / Th
        f2 = jnp.where(t >= Th, 2 - f2, f2)
        weight = f * f2
        weight = jnp.where(step < Th, jnp.maximum(weight, 0.1), weight)
        return lr * weight

    return fn


def with_warmup(schedule: Schedule, warmup_iter: int, lr: float) -> Schedule:
    """Linear warmup (``base_model.py:163-185``): lr ramps 0 -> base over
    ``warmup_iter`` steps, then hands off to the base schedule."""
    if warmup_iter <= 0:
        return schedule

    def fn(step):
        warm = lr * (step / warmup_iter)
        return jnp.where(step < warmup_iter, warm, schedule(step))

    return fn


def build_schedule(kind: str, lr: float, total_iter: int, *,
                   eta_min: float = 0.0, warmup_iter: int = -1,
                   **kw) -> Schedule:
    kind = kind.lower()
    if kind in ('cosine', 'truecosineannealinglr'):
        s = true_cosine_annealing(lr, kw.get('T_max', total_iter), eta_min)
    elif kind == 'cosineannealingrestartlr':
        s = cosine_annealing_restart(lr, kw['periods'],
                                     kw.get('restart_weights', (1,)), eta_min)
    elif kind in ('multisteplr', 'multistepreartlr', 'multisteprestartlr'):
        s = multi_step_restart(lr, kw['milestones'], kw.get('gamma', 0.1),
                               kw.get('restarts', (0,)),
                               kw.get('restart_weights', (1,)))
    elif kind == 'linearlr':
        s = linear_decay(lr, total_iter)
    elif kind == 'vibratelr':
        s = vibrate(lr, total_iter)
    else:
        raise ValueError(f'unknown scheduler {kind}')
    return with_warmup(s, warmup_iter, lr)
