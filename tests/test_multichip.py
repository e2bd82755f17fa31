"""Multi-device tests on the 8-device virtual CPU mesh.

Validates the framework's SPMD story without hardware: data-parallel train
steps produce the same result as single-device, gradients all-reduce, and the
temporal-sharded forward matches the unsharded one.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import cpu_devices
from shiftnet_tpu.models import build_model, init_params
from shiftnet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from shiftnet_tpu.train.optim import OptimConfig, build_optimizer
from shiftnet_tpu.train.step import (TaskConfig, TrainState, make_train_step,
                                     shard_train_step)

CPU0 = jax.devices('cpu')[0]


TINY = dict(n_feats0=8, n_feats2=16, num_orbs=1, tfr_scale=4,
            shift_rounds=1, encoder2_levels=2)


def _tiny_setup(kind='deblur', n_dev=4):
    mesh = make_mesh(devices=cpu_devices(n_dev), time=1)
    with jax.default_device(CPU0):
        # Shrunken config: the parallelism semantics under test are
        # independent of network size, and full-size graphs take minutes to
        # compile on the single host CPU core.
        model = build_model(
            'deblur_small' if kind == 'deblur' else 'denoise_small', **TINY)
        t, p = 4 if kind == 'deblur' else 3, 16
        x0 = jnp.zeros((t, p, p, 3))
        nm0 = jnp.zeros((t, p, p, 1)) if kind == 'denoise' else None
        params = init_params(model, x0, nm0)
        task = TaskConfig(kind=kind,
                          center_slice=(1, 1) if kind == 'deblur' else (0, 0))
        tx = build_optimizer(OptimConfig(total_iters=10, grad_clip=0.01),
                             params)
        state = TrainState.create(params, tx)
        rngb = np.random.default_rng(0)
        b = n_dev
        batch = {'gt': rngb.uniform(0, 1, (b, t, p, p, 3)).astype(np.float32)}
        if kind == 'deblur':
            batch['lq'] = rngb.uniform(0, 1, (b, t, p, p, 3)).astype(np.float32)
    return mesh, model, task, tx, state, batch


@pytest.mark.parametrize('kind', ['deblur', 'denoise'])
def test_dp_step_matches_single_device(kind):
    mesh, model, task, tx, state, batch = _tiny_setup(kind)
    step = make_train_step(model, tx, task)
    rng = jax.random.PRNGKey(7)

    # single-(cpu)-device reference
    with jax.default_device(CPU0):
        s1, m1 = jax.jit(step)(state, batch, rng)

    # 4-way data parallel
    sharded = shard_train_step(step, mesh)
    state_r = jax.device_put(state, replicated(mesh))
    batch_r = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
    s4, m4 = sharded(state_r, batch_r, jax.device_put(rng, replicated(mesh)))

    assert np.allclose(float(m1['loss']), float(m4['loss']), rtol=1e-5)
    l1 = jax.tree.leaves(s1.params)
    l4 = jax.tree.leaves(jax.device_get(s4.params))
    for a, b in zip(l1, l4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_loss_decreases_over_steps():
    mesh, model, task, tx, state, batch = _tiny_setup('deblur', n_dev=2)
    sharded = shard_train_step(make_train_step(model, tx, task), mesh)
    state = jax.device_put(state, replicated(mesh))
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, m = sharded(state, batch, sub)
        losses.append(float(m['loss']))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


@pytest.mark.parametrize('kind,fused', [
    ('deblur', False),
    ('denoise', False),
    # fused legs compile the interpret-mode Pallas graph fwd+bwd on the
    # single CPU core — minutes each (persistent cache makes reruns fast)
    pytest.param('deblur', True, marks=pytest.mark.slow),
    pytest.param('denoise', True, marks=pytest.mark.slow),
])
def test_tsharded_train_step_matches_single_device(kind, fused):
    """Sequence-parallel training (frame axis sharded over a 'time' mesh
    axis, per-round ppermute halo exchange in fwd AND bwd, psum'd masked
    loss) == the plain single-device train step.  This is the path that
    makes reference-scale sequences (n_sequence 16-23 @ patch 256,
    options/gopro_deblur.yml:13,20) trainable: per-device activations scale
    1/time_shards."""
    from shiftnet_tpu.train.step import make_tsharded_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    # shift_rounds=2 exercises the lax.scan round-pair path (fwd + rev
    # shifts with cross-shard ppermute inside a remat'd scan body).
    # fused=True runs the packed-CHW Pallas forward (interpret mode on
    # CPU) with the sharded packed temporal shift
    # (ops/naf_chw.temporal_shift_chw(axis=...)) — the round-5 path that
    # trains reference scale on the fast kernels.
    tiny = dict(TINY, shift_rounds=2, fused_chw=fused)
    extra = {}
    if kind == 'denoise':
        # exercise ShiftCAB's sharded temporal shift too
        extra = dict(encoder2_level0_shift_cabs=True)
    variant = 'deblur_small' if kind == 'deblur' else 'denoise_small'
    t, p, b = 8, 16, 2
    with jax.default_device(CPU0):
        model = build_model(variant, **tiny, **extra)
        x0 = jnp.zeros((t, p, p, 3))
        nm0 = jnp.zeros((t, p, p, 1)) if kind == 'denoise' else None
        params = init_params(model, x0, nm0)
        task = TaskConfig(kind=kind,
                          center_slice=(1, 1) if kind == 'deblur' else (0, 0))
        tx = build_optimizer(OptimConfig(total_iters=10, grad_clip=0.01),
                             params)
        state = TrainState.create(params, tx)
        rngb = np.random.default_rng(0)
        batch = {'gt': rngb.uniform(0, 1, (b, t, p, p, 3)).astype(np.float32)}
        if kind == 'deblur':
            batch['lq'] = rngb.uniform(
                0, 1, (b, t, p, p, 3)).astype(np.float32)
        rng = jax.random.PRNGKey(7)
        s1, m1 = jax.jit(make_train_step(model, tx, task))(state, batch, rng)

    mesh = make_mesh(data=2, time=4, devices=cpu_devices(8))
    # identical param tree: time_axis / past / future are not parameters
    model_ts = build_model(variant, past_frames=0, future_frames=0,
                           time_axis='time', **tiny, **extra)
    ts_step = make_tsharded_train_step(model_ts, tx, task, mesh)
    clip_sh = NamedSharding(mesh, P('data', 'time'))
    s2, m2 = ts_step(jax.device_put(state, replicated(mesh)),
                     {k: jax.device_put(v, clip_sh) for k, v in batch.items()},
                     jax.device_put(rng, replicated(mesh)))

    assert np.allclose(float(m1['loss']), float(m2['loss']), rtol=1e-5), (
        float(m1['loss']), float(m2['loss']))
    l1 = jax.tree.leaves(jax.device_get(s1.params))
    l2 = jax.tree.leaves(jax.device_get(s2.params))
    for a, c in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-6)


def test_evaluator_tp_forward_window_matches_windowed():
    """Evaluator(tp=N).forward_window == the reference's windowed inference
    with window = T/tp (the documented edge-halo equivalence)."""
    from shiftnet_tpu.eval.runner import Evaluator

    n_dev, halo, local_t = 4, 1, 2
    tt = n_dev * local_t
    p = 16
    with jax.default_device(CPU0):
        model = build_model('deblur_small', past_frames=halo,
                            future_frames=halo, **TINY)
        params = init_params(model, jnp.zeros((local_t + 2 * halo, p, p, 3)))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (tt, p, p, 3)), jnp.float32)

        def apply_fn(prm, clip):
            return model.apply({'params': prm}, clip)

        def pad_window(k):
            lo, hi = k * local_t - halo, (k + 1) * local_t + halo
            idx = np.clip(np.arange(lo, hi), 0, tt - 1)
            return x[idx]

        want_all = jnp.concatenate(
            [apply_fn(params, pad_window(k)) for k in range(n_dev)], axis=0)
        want = np.asarray(want_all)[halo:tt - halo]

    ev = Evaluator('deblur_small', params, halo=halo, bf16=False,
                   overrides=TINY, tp=n_dev, tp_devices=cpu_devices(n_dev),
                   result_path='/tmp/tp_eval_test')
    got = ev.forward_window(x)
    assert got.shape == (tt - 2 * halo, p, p, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_evaluator_tp_forward_window_denoise_and_pad():
    """`--tp` works for denoise (noise-map branch routes through the
    t-sharded forward) and a window with T % tp != 0 is handled by a logged
    replicate-pad, never silently unsharded.  Equivalence target: windowed
    inference with window = ceil(T/tp) clamp-padded windows and a constant
    noise map."""
    from shiftnet_tpu.eval.runner import Evaluator

    n_dev, halo, local_t = 4, 1, 2
    tt = n_dev * local_t
    p = 16
    sigma = 10.0 / 255.0
    with jax.default_device(CPU0):
        model = build_model('denoise_small', past_frames=halo,
                            future_frames=halo, **TINY)
        x0 = jnp.zeros((local_t + 2 * halo, p, p, 3))
        nm0 = jnp.zeros((local_t + 2 * halo, p, p, 1))
        params = init_params(model, x0, nm0)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (tt, p, p, 3)), jnp.float32)

        def apply_fn(prm, clip):
            nm = jnp.full(clip.shape[:3] + (1,), sigma, clip.dtype)
            return model.apply({'params': prm}, clip, nm)

        def pad_window(k):
            lo, hi = k * local_t - halo, (k + 1) * local_t + halo
            idx = np.clip(np.arange(lo, hi), 0, tt - 1)
            return x[idx]

        want_all = jnp.concatenate(
            [apply_fn(params, pad_window(k)) for k in range(n_dev)], axis=0)
        want = np.asarray(want_all)[halo:tt - halo]

    ev = Evaluator('denoise_small', params, halo=halo, bf16=False,
                   overrides=TINY, tp=n_dev, tp_devices=cpu_devices(n_dev),
                   result_path='/tmp/tp_eval_test_dn')
    got = ev.forward_window(x, sigma)
    assert got.shape == (tt - 2 * halo, p, p, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # T % tp != 0: drop one frame -> the evaluator replicate-pads (logged)
    # and still returns the full interior.  The last interior frame's right
    # context becomes clamp-replicated (edge-halo semantics), so compare
    # only the frames whose windows are unchanged.
    tt2 = tt - 1
    got2 = ev.forward_window(x[:tt2], sigma)
    assert got2.shape == (tt2 - 2 * halo, p, p, 3)
    log = open(ev.logger.path).read()
    assert '[tp] window T=7' in log
    np.testing.assert_allclose(got2[:local_t - halo], want[:local_t - halo],
                               rtol=1e-5, atol=1e-5)


def test_temporal_parallel_matches_windowed():
    """T-sharded forward == per-window forward with the same halos."""
    from shiftnet_tpu.parallel.temporal import temporal_parallel_forward

    n_dev, halo, local_t = 4, 1, 3
    t = n_dev * local_t
    mesh = make_mesh(devices=cpu_devices(n_dev), time=n_dev)

    with jax.default_device(CPU0):
        model = build_model('deblur_small', past_frames=halo,
                            future_frames=halo, **TINY)
        p = 16
        x0 = jnp.zeros((local_t + 2 * halo, p, p, 3))
        params = init_params(model, x0)
        rng = np.random.default_rng(1)
        video = jnp.asarray(rng.uniform(0, 1, (t, p, p, 3)), jnp.float32)

        def apply_fn(params, clip):
            return model.apply({'params': params}, clip)

        # Reference: windowed inference with clamp-duplicated edge halos.
        def pad_window(k):
            lo, hi = k * local_t - halo, (k + 1) * local_t + halo
            idx = np.clip(np.arange(lo, hi), 0, t - 1)
            return video[idx]

        want = jnp.concatenate(
            [apply_fn(params, pad_window(k)) for k in range(n_dev)], axis=0)

    sharded = temporal_parallel_forward(apply_fn, mesh, halo=halo)
    got = sharded(params, video)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
