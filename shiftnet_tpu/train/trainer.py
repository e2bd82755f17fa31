"""The training orchestrator.

Replaces ``basicsr/train1.py`` / ``train2.py`` + the four trainer wrappers
(``image_restoration{,1,2,3}_model.py``) with one config-driven loop:
model + optimizer + sharded step + loader + checkpoints + logging +
auto-resume + periodic visual dumps.
"""
from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from shiftnet_tpu.data.loader import PrefetchLoader
from shiftnet_tpu.data.video_dataset import ShardedEpochSampler, VideoFolderDataset
from shiftnet_tpu.models import CONFIGS, build_model, init_params
from shiftnet_tpu.parallel.mesh import (batch_sharding, init_distributed,
                                        is_primary, make_mesh, replicated)
from shiftnet_tpu.train.checkpoint import CheckpointManager, save_params_npz
from shiftnet_tpu.train.optim import OptimConfig, build_optimizer
from shiftnet_tpu.train.step import (TaskConfig, TrainState, make_train_step,
                                     shard_train_step)
from shiftnet_tpu.utils.config import make_exp_dirs
from shiftnet_tpu.utils.logging import TrainLogger, get_logger


def staged_batches(loader, put):
    """1-deep device-side prefetch (the reference CUDAPrefetcher,
    ``prefetch_dataloader.py:90-133``, stages the next batch on a side CUDA
    stream): issue batch N+1's async H2D transfer (``put``) before batch N
    is consumed, so the copy overlaps the device step.  Yields
    ``(host_batch, staged_batch)`` for every loader batch, in order."""
    pending = None
    for batch in loader:
        staged = (batch, put(batch))
        if pending is not None:
            yield pending
        pending = staged
    if pending is not None:
        yield pending


class Trainer:
    def __init__(self, opt: dict[str, Any]):
        self.opt = opt
        init_distributed()
        make_exp_dirs(opt)
        self.logger = get_logger(
            'shiftnet', os.path.join(opt['path']['log'], 'train.log'),
            is_primary())

        variant = opt['model']
        compute_dtype = jnp.bfloat16 if opt.get('bf16', True) else jnp.float32
        mcfg = CONFIGS[variant]
        task_kind = 'denoise' if mcfg.noise_map else 'deblur'
        # Training predicts all-but-(fb,ff) frames: deblur 1/1, denoise 0/0
        # (constructor defaults — gshift_deblur1.py:728, gshift_denoise1.py:758).
        # fused_chw trains on the packed-CHW Pallas forward with the custom
        # VJPs (ops/chw_grad.py); shapes the packing can't take fall back
        # per-shape inside the model.  Opt-out via `fused: false`.
        #
        # `time_parallel: N` shards each clip's FRAME axis over an N-way
        # 'time' mesh axis (exact sequence parallelism, ppermute halo
        # exchange per shift round — train/step.py make_tsharded_train_step).
        # This is how reference-scale sequences (n_sequence 16-23 @ patch
        # 256, options/gopro_deblur.yml:13,20) train when a single chip's
        # HBM can't hold the clip: per-device activations scale 1/N.  The
        # t-sharded step runs the fused packed-CHW forward too (round 5):
        # the shard-local kernels are frame-local, and the temporal shifts
        # route through the ppermute packed variant.
        self.time_parallel = int(opt.get('time_parallel', 1))
        # Training default: UNFUSED (plain XLA NHWC autodiff).  Measured
        # round 5 (tools/bench_train.py; table in PERF.md): at training
        # patches (256^2) the packed-CHW kernels hit the narrow-row VMEM
        # derate and the round-pair remat re-runs them in the backward —
        # 2.2-3.7x SLOWER than XLA autodiff — and fused OOMs at T=16
        # where unfused fits the FULL reference clip (T=23 patch 256,
        # 3.27 s/step) on one 16 GB chip.  `fused: true` keeps the
        # packed-CHW custom-VJP path available (it wins at inference
        # scales, not training scales).
        fused = (bool(opt.get('fused', False))
                 and compute_dtype == jnp.bfloat16)
        # self.model is always traceable OUTSIDE shard_map (init, visual
        # dumps, validation); the time-axis twin (identical param tree —
        # time_axis/past/future don't touch parameters) exists only for the
        # sharded step.  `model_overrides` lets configs/tests shrink or tweak
        # the architecture (e.g. tiny widths for smoke tests).
        mov = dict(opt.get('model_overrides') or {})
        self.model = build_model(variant, dtype=compute_dtype,
                                 fused_chw=fused, **mov)
        self._ts_model = None
        if self.time_parallel > 1:
            assert int(opt['n_sequence']) % self.time_parallel == 0, (
                'n_sequence must divide by time_parallel',
                opt['n_sequence'], self.time_parallel)
            self._ts_model = build_model(variant, dtype=compute_dtype,
                                         past_frames=0, future_frames=0,
                                         time_axis='time', fused_chw=fused,
                                         **mov)
        self.task = TaskConfig(
            kind=task_kind,
            loss_spec=opt.get('loss_type', '1*L1'),
            center_slice=(mcfg.past_frames, mcfg.future_frames))

        train_opt = opt['train']
        self.total_iters = int(train_opt['total_iter'])
        ocfg = OptimConfig(
            lr=float(train_opt['optim_g']['lr']),
            betas=tuple(train_opt['optim_g'].get('betas', (0.9, 0.99))),
            weight_decay=float(train_opt['optim_g'].get('weight_decay', 0.0)),
            total_iters=int(train_opt['scheduler'].get('T_max',
                                                       self.total_iters)),
            eta_min=float(train_opt['scheduler'].get('eta_min', 1e-7)),
            scheduler_kind=str(train_opt['scheduler'].get('type', 'cosine')),
            scheduler_kwargs={k: v for k, v in train_opt['scheduler'].items()
                              if k not in ('type', 'eta_min')},
            warmup_iter=int(train_opt.get('warmup_iter', -1)),
            grad_clip=train_opt.get('grad_clip', 0.01),
            lr_group_scales=train_opt.get('lr_group_scales', {}) or {},
        )
        self.optim_cfg = ocfg

        # Mesh / sharding: data parallel by default; ('data', 'time') when
        # time_parallel > 1.  `device_platform` / `num_devices` pin the mesh
        # (tests: a 1-device CPU mesh).
        devs = None
        if opt.get('device_platform'):
            devs = jax.devices(str(opt['device_platform']))
        if opt.get('num_devices'):
            devs = list(devs if devs is not None
                        else jax.devices())[:int(opt['num_devices'])]
        self.mesh = make_mesh(time=self.time_parallel, devices=devs)
        n_dp = self.mesh.shape['data']
        self.batch_size = opt.get('batch_size_per_device', 1) * n_dp
        self.logger.info(
            f'mesh: {dict(self.mesh.shape)}; global batch {self.batch_size}')

        # Data.
        ds_opt = opt['datasets']['train']
        if ds_opt.get('packed_gt'):
            from shiftnet_tpu.data.packed import PackedVideoDataset
            self.dataset = PackedVideoDataset(
                ds_opt['packed_gt'],
                ds_opt.get('packed_lq') if task_kind == 'deblur' else None,
                n_seq=int(opt['n_sequence']),
                patch_size=int(opt.get('patch_size', 256)),
                size_must_mode=int(opt.get('size_must_mode', 4)),
                augment=not opt.get('no_augment', False))
        else:
            self.dataset = VideoFolderDataset(
                ds_opt['dir_data'], n_seq=int(opt['n_sequence']),
                gt_dir=ds_opt.get('gt_dir', 'gt'),
                lq_dir=(ds_opt.get('lq_dir', 'blur')
                        if task_kind == 'deblur' else None),
                patch_size=int(opt.get('patch_size', 256)),
                size_must_mode=int(opt.get('size_must_mode', 4)),
                augment=not opt.get('no_augment', False),
                n_frames_per_video=opt.get('n_frames_per_video'))
        sampler = ShardedEpochSampler(
            len(self.dataset),
            ratio=int(ds_opt.get('dataset_enlarge_ratio', 1)),
            num_shards=jax.process_count(),
            shard=jax.process_index(), seed=int(opt.get('manual_seed', 0)))
        self.loader = PrefetchLoader(
            self.dataset, sampler, batch_size=self.batch_size,
            num_threads=int(ds_opt.get('num_worker_per_gpu', 2)),
            seed=int(opt.get('manual_seed', 0)))
        self.steps_per_epoch = max(len(self.dataset) // self.batch_size, 1)

        # Init / resume.
        self.ckpt = CheckpointManager(opt['path']['training_states'],
                                      max_to_keep=3)
        t, p = int(opt['n_sequence']), int(opt.get('patch_size', 256))
        p -= p % int(opt.get('size_must_mode', 4))
        x0 = jnp.zeros((t, p, p, 3), compute_dtype)
        nm0 = jnp.zeros((t, p, p, 1), compute_dtype) if mcfg.noise_map else None
        params = init_params(self.model, x0, nm0,
                             seed=int(opt.get('manual_seed', 0)))
        self.tx = build_optimizer(ocfg, params)
        state = TrainState.create(params, self.tx)
        restored = self.ckpt.restore(state)
        if restored is not None:
            state = restored
            self.logger.info(f'auto-resumed from step {int(state.step)}')
            # Fast-forward the batch stream (index arithmetic, no decode) so
            # the resumed run consumes exactly the batches the uninterrupted
            # run would — resume is bitwise-reproducible
            # (tests/test_trainer.py).  Reference auto-resume:
            # train1.py:137-158 (which replays data instead).
            self.loader.start_batch = int(state.step)
        self.state = jax.device_put(state, replicated(self.mesh))

        if self.time_parallel > 1:
            from shiftnet_tpu.train.step import make_tsharded_train_step
            self.train_step = make_tsharded_train_step(
                self._ts_model, self.tx, self.task, self.mesh)
        else:
            step_fn = make_train_step(self.model, self.tx, self.task)
            self.train_step = shard_train_step(step_fn, self.mesh)
        self.rng = jax.random.PRNGKey(
            int(opt.get('manual_seed', 0)) + jax.process_index() + 1)
        self._vis_fwd = None

    def current_lr(self, step: int) -> float:
        from shiftnet_tpu.train.optim import cosine_lr
        return float(cosine_lr(self.optim_cfg)(step))

    def run(self):
        opt = self.opt
        log_cfg = opt.get('logger', {})
        print_freq = int(log_cfg.get('print_freq', 500))
        save_freq = int(log_cfg.get('save_checkpoint_freq', 10_000))
        start_iter = int(self.state.step)
        tlog = TrainLogger(self.logger, self.total_iters, start_iter,
                           tb_dir=os.path.join(opt['path']['log'], 'tb')
                           if log_cfg.get('use_tb_logger') else None)
        visual_freq = int(log_cfg.get('visual_freq', 0))  # ref: 2000
        val_cfg = self.opt.get('val') or {}
        val_freq = int(float(val_cfg.get('val_freq', 0)))
        it = start_iter
        if self.time_parallel > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_sharding = NamedSharding(self.mesh, P('data', 'time'))
        else:
            data_sharding = batch_sharding(self.mesh)

        for batch, dev_batch in staged_batches(
                self.loader, lambda b: {k: jax.device_put(v, data_sharding)
                                        for k, v in b.items()}):
            if it >= self.total_iters:
                break
            # Step-keyed rng (not a sequential split): a resumed run at step
            # N draws the same noise/sigma stream the uninterrupted run
            # would — bitwise-reproducible resume for the denoise task.
            step_rng = jax.random.fold_in(self.rng, it)
            self.state, metrics = self.train_step(self.state, dev_batch,
                                                  step_rng)
            it += 1
            if it % print_freq == 0 and is_primary():
                m = jax.device_get(metrics)
                tlog(it, it // self.steps_per_epoch, self.current_lr(it), m)
            if visual_freq and it % visual_freq == 0 and is_primary():
                self.dump_visuals(it, batch)
            if it % save_freq == 0 and is_primary():
                self.save(it)
            if val_freq and it % val_freq == 0 and is_primary():
                self.validate(it, val_cfg)
        self.loader.stop()
        if is_primary():
            self.save(it)
            self.logger.info('training complete')

    def validate(self, it: int, val_cfg: dict):
        """Windowed-eval validation on a held-out video folder (optional;
        the reference ships with this loop disabled — train1.py:253-260)."""
        from shiftnet_tpu.eval.runner import Evaluator
        # One Evaluator for the whole run: its per-shape jit cache makes
        # every validation after the first compile-free.
        if getattr(self, '_validator', None) is None:
            # `val.metrics` dispatches by name through the metric registry
            # (eval/registry.py) — the reference's `with_metrics` loop
            # (image_restoration_model.py:392-425); e.g.
            #   val: {metrics: {psnr: {type: psnr},
            #                   niqe: {type: calculate_niqe}}}
            self._validator = Evaluator(
                self.opt['model'], self.state.params,
                result_path=os.path.join(self.opt['path']['log'], 'val'),
                bf16=self.opt.get('bf16', True),
                metrics=val_cfg.get('metrics'),
                overrides=self.opt.get('model_overrides'))
        ev = self._validator
        ev.params = self.state.params
        # reference validation options: grids tiling + rot/flip TTA
        # (image_restoration_model.py:161-252, val.grids / val.crop_size)
        gkw = dict(grids=bool(val_cfg.get('grids', False)),
                   crop_size=int(val_cfg.get('crop_size', 256)),
                   trans_num=int(val_cfg.get('trans_num', 1)))
        if self.task.kind == 'denoise':
            res = ev.eval_denoise(val_cfg['dir_data'],
                                  float(val_cfg.get('sigma', 10.0)), **gkw)
        else:
            res = ev.eval_deblur(val_cfg['dir_data'],
                                 one_len=int(val_cfg.get('one_len', 16)),
                                 **gkw)
        self.logger.info(
            f'[val @ {it}] ' + ' '.join(
                f'{k.upper()} {v:.5g}' for k, v in res.items()
                if isinstance(v, float)))

    def dump_visuals(self, it: int, batch):
        """Save an (input, gt, output) PNG triplet for the first clip's
        center frame (reference ``train1.py:261-274``)."""
        import imageio.v2 as imageio
        gt = batch['gt'][0]
        lq = batch.get('lq', batch['gt'])[0]
        fb, ff = self.task.center_slice
        if self._vis_fwd is None:
            if self.task.kind == 'denoise':
                self._vis_fwd = jax.jit(lambda p, x, nm: self.model.apply(
                    {'params': p}, x, nm))
            else:
                self._vis_fwd = jax.jit(lambda p, x: self.model.apply(
                    {'params': p}, x))
        x = jnp.asarray(lq, self.model.dtype)
        if self.task.kind == 'denoise':
            nm = jnp.full(x.shape[:3] + (1,), 25.0 / 255.0, x.dtype)
            out = self._vis_fwd(self.state.params, x, nm)
        else:
            out = self._vis_fwd(self.state.params, x)
        out = np.asarray(out.astype(jnp.float32))
        mid = out.shape[0] // 2
        d = self.opt['path']['visualization']
        os.makedirs(d, exist_ok=True)

        def dump(name, img):
            imageio.imwrite(os.path.join(d, f'{it:08d}_{name}.png'),
                            (np.clip(img, 0, 1) * 255).astype(np.uint8))

        dump('input', lq[fb + mid])
        dump('gt', gt[fb + mid])
        dump('output', out[mid])

    def save(self, it: int):
        self.ckpt.save(it, jax.device_get(self.state))
        npz = os.path.join(self.opt['path']['models'], f'net_g_{it}.npz')
        save_params_npz(npz, self.state.params)
        self.logger.info(f'saved checkpoint @ {it} -> {npz}')
