"""Trainer end-to-end smoke + resume-reproduces test (CPU, tiny config).

Covers what the suite previously never ran: the Trainer constructor + loop,
CheckpointManager save/restore, auto-resume (reference ``train1.py:137-158``
+ ``base_model.py:288-328``), and the npz weight export.  The resume
contract here is STRONGER than the reference's (which replays data after
resume): the loader fast-forwards its deterministic batch stream, so an
interrupted-and-resumed run reproduces the uninterrupted run bitwise.
"""
import os

import numpy as np
import pytest
import jax

from conftest import cpu_devices

CPU0 = jax.devices('cpu')[0]

TINY_OVERRIDES = dict(n_feats0=8, n_feats2=16, num_orbs=1, tfr_scale=4,
                      shift_rounds=1, encoder2_levels=2)


@pytest.fixture(scope='module')
def synth_ds(tmp_path_factory):
    """Two tiny clips of 8 frames each, gt + blur folders.  Frames are
    104x96 so NIQE (96px blocks) has at least one block to score."""
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp('synth_ds')
    rng = np.random.default_rng(0)
    for sub in ('gt', 'blur'):
        for v in ('clip1', 'clip2'):
            d = root / 'train' / sub / v
            d.mkdir(parents=True, exist_ok=True)
            base = rng.integers(0, 255, (104, 96, 3)).astype('uint8')
            for i in range(8):
                img = np.clip(base.astype(int)
                              + rng.integers(-20, 20, (104, 96, 3)),
                              0, 255).astype('uint8')
                imageio.imwrite(str(d / f'{i:03d}.png'), img)
    return str(root / 'train')


def make_opt(exp_root: str, data_path: str, total_iter: int,
             name: str, t_max: int | None = None) -> dict:
    # ``t_max`` pins the cosine horizon independently of ``total_iter``:
    # the resume test interrupts a run by shrinking total_iter, and without
    # a pinned T_max the interrupted run would train its first steps under
    # a different LR schedule than the uninterrupted one (cosine T=4 vs
    # T=6) — the resumed params could never match bitwise.
    return {
        'name': name,
        'model': 'deblur_small',
        'model_overrides': dict(TINY_OVERRIDES),
        'bf16': False,
        'fused': False,
        'n_sequence': 4,
        'patch_size': 32,
        'manual_seed': 3,
        'device_platform': 'cpu',
        'num_devices': 1,
        'datasets': {'train': {'dir_data': data_path,
                               'num_worker_per_gpu': 1}},
        'train': {
            'total_iter': total_iter,
            'optim_g': {'lr': 2e-4},
            'scheduler': {'type': 'cosine', 'eta_min': 1e-7,
                          **({'T_max': t_max} if t_max else {})},
            'grad_clip': 0.01,
        },
        'logger': {'print_freq': 100, 'save_checkpoint_freq': 1000},
        'path': {
            'experiments_root': exp_root,
            'models': os.path.join(exp_root, 'models'),
            'training_states': os.path.join(exp_root, 'training_states'),
            'log': exp_root,
            'visualization': os.path.join(exp_root, 'visualization'),
        },
    }


def run_trainer(opt):
    from shiftnet_tpu.train.trainer import Trainer
    with jax.default_device(CPU0):
        tr = Trainer(opt)
        tr.run()
        params = jax.device_get(tr.state.params)
        step = int(tr.state.step)
    return tr, params, step


@pytest.mark.slow
def test_trainer_smoke_and_resume_reproduces(synth_ds, tmp_path):
    # Uninterrupted 6-iter run.
    opt_a = make_opt(str(tmp_path / 'exp_a'), synth_ds, 6, 'smoke_a',
                     t_max=6)
    tr_a, params_a, step_a = run_trainer(opt_a)
    assert step_a == 6
    assert os.path.exists(os.path.join(opt_a['path']['models'],
                                       'net_g_6.npz'))

    # Interrupted run: 4 iters, then a NEW Trainer instance auto-resumes
    # from the orbax checkpoint and finishes to 6.  T_max is pinned to the
    # full horizon in BOTH configs so the interrupt changes only where the
    # run stops, not the LR schedule it trains under.
    opt_b4 = make_opt(str(tmp_path / 'exp_b'), synth_ds, 4, 'smoke_b',
                      t_max=6)
    tr_b, params_b4, step_b4 = run_trainer(opt_b4)
    assert step_b4 == 4
    assert tr_b.ckpt.latest_step() == 4

    opt_b6 = make_opt(str(tmp_path / 'exp_b'), synth_ds, 6, 'smoke_b',
                      t_max=6)
    tr_b2, params_b6, step_b6 = run_trainer(opt_b6)
    assert step_b6 == 6
    # The resumed loader must have fast-forwarded to global batch 4.
    assert tr_b2.loader.start_batch == 4

    # Bitwise identical parameters: resume reproduces the uninterrupted run.
    la = jax.tree.leaves(params_a)
    lb = jax.tree.leaves(params_b6)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainer_validate_metric_registry(synth_ds, tmp_path):
    """Trainer.validate with a configured metric dict dispatches through the
    registry (reference ``with_metrics`` loop) — NIQE reachable from
    config."""
    opt = make_opt(str(tmp_path / 'exp_v'), synth_ds, 1, 'smoke_v')
    opt['val'] = {
        'dir_data': synth_ds,
        'one_len': 4,
        'metrics': {
            'psnr': {'type': 'psnr'},
            'niqe': {'type': 'calculate_niqe', 'crop_border': 0},
        },
    }
    from shiftnet_tpu.train.trainer import Trainer
    with jax.default_device(CPU0):
        tr = Trainer(opt)
        tr.validate(0, opt['val'])
        tr.loader.stop()
    ev = tr._validator
    assert set(ev.metrics) == {'psnr', 'niqe'}
    # the validator ran both metrics over the val clips
    log = open(ev.logger.path).read()
    assert 'AVG-PSNR' in log and 'AVG-NIQE' in log


@pytest.mark.slow
def test_trainer_loss_decreases(synth_ds, tmp_path):
    opt = make_opt(str(tmp_path / 'exp_c'), synth_ds, 8, 'smoke_c')
    from shiftnet_tpu.train.trainer import Trainer
    from shiftnet_tpu.parallel.mesh import batch_sharding
    with jax.default_device(CPU0):
        tr = Trainer(opt)
        losses = []
        sh = batch_sharding(tr.mesh)
        it = 0
        for batch in tr.loader:
            if it >= 8:
                break
            dev = {k: jax.device_put(v, sh) for k, v in batch.items()}
            rng = jax.random.fold_in(tr.rng, it)
            tr.state, m = tr.train_step(tr.state, dev, rng)
            losses.append(float(m['loss']))
            it += 1
        tr.loader.stop()
    assert losses[-1] < losses[0], losses
