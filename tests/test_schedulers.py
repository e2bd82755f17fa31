"""LR schedule parity with the reference closed forms."""
import math

import numpy as np
import jax.numpy as jnp

from shiftnet_tpu.train.schedulers import build_schedule


def test_true_cosine():
    lr, T, emin = 4e-4, 300_000, 1e-7
    s = build_schedule('cosine', lr, T, eta_min=emin)
    for t in (0, 1, 12345, 150_000, 300_000):
        want = emin + (lr - emin) * 0.5 * (1 + math.cos(math.pi * t / T))
        assert abs(float(s(jnp.asarray(t))) - want) < 1e-9


def test_cosine_restart():
    # lr_scheduler.py docstring example: periods [10]*4, weights [1,.5,.5,.5]
    s = build_schedule('CosineAnnealingRestartLR', 1e-3, 40,
                       periods=[10, 10, 10, 10],
                       restart_weights=[1, 0.5, 0.5, 0.5], eta_min=1e-7)
    assert abs(float(s(jnp.asarray(0))) - 1e-3) < 1e-8
    # just after first restart: weight 0.5 at phase 0 -> 0.5e-3
    assert abs(float(s(jnp.asarray(11))) - (
        1e-7 + 0.5 * 0.5 * (1e-3 - 1e-7) * (1 + math.cos(math.pi * 1 / 10)))
    ) < 1e-8


def test_linear():
    s = build_schedule('LinearLR', 1e-3, 1000)
    assert abs(float(s(jnp.asarray(0))) - 1e-3) < 1e-9
    assert abs(float(s(jnp.asarray(500))) - 5e-4) < 1e-9


def test_multistep():
    s = build_schedule('MultiStepRestartLR', 1e-3, 1000,
                       milestones=[100, 200], gamma=0.1)
    assert abs(float(s(jnp.asarray(50))) - 1e-3) < 1e-9
    assert abs(float(s(jnp.asarray(150))) - 1e-4) < 1e-9
    assert abs(float(s(jnp.asarray(250))) - 1e-5) < 1e-10


def test_vibrate_matches_reference_formula():
    lr, total = 1e-3, 8000
    s = build_schedule('VibrateLR', lr, total)
    T = total // 80
    Th = T // 2
    for step in (0, 10, 49, 50, 77, 120, 3100, 5100, 7900):
        process = step / total
        f = 0.1
        if process < 3 / 8:
            f = 1 - process * 8 / 3
        elif process < 5 / 8:
            f = 0.2
        t = step % T
        f2 = t / Th
        if t >= Th:
            f2 = 2 - f2
        weight = f * f2
        if step < Th:
            weight = max(0.1, weight)
        assert abs(float(s(jnp.asarray(step))) - lr * weight) < 1e-9, step


def test_warmup():
    s = build_schedule('cosine', 4e-4, 1000, warmup_iter=100)
    assert float(s(jnp.asarray(0))) == 0.0
    assert abs(float(s(jnp.asarray(50))) - 2e-4) < 1e-9
    assert float(s(jnp.asarray(100))) > 3.9e-4
