"""Jitted training / eval steps, sharded over the device mesh.

Replaces the reference's trainer-wrapper layer
(``basicsr/models/image_restoration{,1,2,3}_model.py``): one functional train
step covering both tasks.  Deblur consumes (lq, gt) pairs and supervises the
``T-2`` center frames (``image_restoration_model.py:145-151``); denoise
synthesizes per-clip sigma ~ U(0, 50/255) gaussian noise and a constant noise
map *on device inside the jitted step*
(``image_restoration2_model.py:141-165`` does this per-batch on GPU).

Data parallelism: the batch axis is sharded over the mesh 'data' axis; the
psum of gradients is inserted by the partitioner (vs DDP bucket allreduce,
``base_model.py:63-80``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from shiftnet_tpu.train.optim import OptimConfig, build_loss, build_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


@dataclasses.dataclass
class TaskConfig:
    """What the step computes: 'deblur' (paired) or 'denoise' (synth noise)."""
    kind: str = 'deblur'
    loss_spec: str = '1*L1'
    sigma_range: tuple[float, float] = (0.0, 50.0 / 255.0)
    center_slice: tuple[int, int] = (1, 1)  # (past, future) frames trimmed


def make_train_step(model, tx, task: TaskConfig,
                    donate: bool = True) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    batch: {'lq': (B,T,H,W,3)} + {'gt': (B,T,H,W,3)}; denoise needs only gt.
    """
    loss_fn = build_loss(task.loss_spec)
    fb, ff = task.center_slice

    def clip_forward(params, lq, noise_map):
        return model.apply({'params': params}, lq, noise_map)

    def step_fn(state: TrainState, batch, rng) -> tuple[TrainState, dict]:
        gt = batch['gt']
        b, t = gt.shape[0], gt.shape[1]
        if task.kind == 'denoise':
            rng_sigma, rng_noise, rng_loss = jax.random.split(rng, 3)
            lo, hi = task.sigma_range
            sigma = jax.random.uniform(rng_sigma, (b, 1, 1, 1, 1),
                                       minval=lo, maxval=hi)
            noise = jax.random.normal(rng_noise, gt.shape, gt.dtype) * sigma
            lq = gt + noise
            noise_map = jnp.broadcast_to(
                sigma.astype(gt.dtype), (b, t) + gt.shape[2:4] + (1,))
            gt_target = gt[:, fb:t - ff] if (fb or ff) else gt
        else:
            lq = batch['lq']
            rng_loss = rng
            noise_map = None
            gt_target = gt[:, fb:t - ff] if (fb or ff) else gt

        def compute_loss(params):
            if noise_map is not None:
                out = jax.vmap(partial(clip_forward, params))(lq, noise_map)
            else:
                out = jax.vmap(
                    lambda c: model.apply({'params': params}, c))(lq)
            out32 = out.astype(jnp.float32)
            return loss_fn(out32, gt_target.astype(jnp.float32), rng_loss)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        return new_state, {'loss': loss, 'grad_norm': gnorm}

    return step_fn


def shard_train_step(step_fn, mesh) -> Callable:
    """jit the step with DP shardings: replicated state, batch on 'data'."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


# ---------------------------------------------------------------------------
# Time-sharded (sequence-parallel) training
# ---------------------------------------------------------------------------

def _parse_loss_terms(spec: str):
    terms = []
    for part in spec.split('+'):
        weight, name = part.split('*')
        terms.append((float(weight), name.strip()))
    return terms


def make_tsharded_train_step(model, tx, task: TaskConfig, mesh,
                             *, data_axis: str = 'data',
                             time_axis: str = 'time') -> Callable:
    """Train step with the clip's FRAME axis sharded over ``mesh[time_axis]``
    (and batch over ``data_axis``) — exact sequence parallelism.

    This is what lets reference-scale sequences (n_sequence 16-23 @ patch 256,
    ``options/gopro_deblur.yml:13,20``) train when one chip's HBM can't hold
    the whole clip's activations: per-device activation memory scales as
    ``1/time_shards``, and the only cross-shard traffic is one frame of
    half-channels per shift round (``ops/shift.py
    _temporal_channel_shift_sharded``, ppermute over ICI) plus the loss/grad
    psums.

    Exactness: the model must be built with ``time_axis=time_axis`` and
    ``past_frames = future_frames = 0`` (it then predicts all T frames; the
    per-frame stage2 makes out[t] independent of which frames are sliced), and
    the loss masks the global edge frames instead of slicing — numerically
    equal to the unsharded step up to collective reduction order
    (tests/test_multichip.py asserts it).

    Returns (state, batch, rng) -> (state, metrics), jitted over ``mesh``.
    """
    assert model.cfg.time_axis == time_axis, (
        'build the model with time_axis to shard the frame axis',
        model.cfg.time_axis, time_axis)
    assert model.cfg.past_frames == 0 and model.cfg.future_frames == 0
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    fb, ff = task.center_slice
    terms = _parse_loss_terms(task.loss_spec)
    scale = 10.0 / jnp.log(10.0)

    def local_loss(params, lq, gt, noise_map, rng_loss):
        """Per-shard masked loss contributions; psum-reduced to the global
        Loss2 value.  lq/gt: (b_loc, t_loc, H, W, C)."""
        if noise_map is not None:
            out = jax.vmap(lambda c, nm: model.apply(
                {'params': params}, c, nm))(lq, noise_map)
        else:
            out = jax.vmap(lambda c: model.apply(
                {'params': params}, c))(lq)
        out = out.astype(jnp.float32)
        tgt = gt.astype(jnp.float32)
        t_loc = gt.shape[1]
        t_total = t_loc * jax.lax.axis_size(time_axis)
        g0 = jax.lax.axis_index(time_axis) * t_loc
        gidx = g0 + jnp.arange(t_loc)
        mask = ((gidx >= fb) & (gidx < t_total - ff)).astype(jnp.float32)
        m = mask[None, :, None, None, None]
        per_frame_px = gt.shape[0] * gt.shape[2] * gt.shape[3] * gt.shape[4]
        axes = (data_axis, time_axis)
        # The mask only varies over 'time'; mark it varying over 'data' too
        # (jax 0.9 shard_map VMA tracking) before the global psum.
        cnt = jax.lax.psum(
            jax.lax.pvary(jnp.sum(mask) * per_frame_px, (data_axis,)), axes)
        d = out - tgt
        total = 0.0
        for w, name in terms:
            if name == 'L1':
                total += w * jax.lax.psum(jnp.sum(jnp.abs(d) * m), axes) / cnt
            elif name in ('MSE', 'L2'):
                total += w * jax.lax.psum(jnp.sum(d * d * m), axes) / cnt
            elif name == 'PSNR':
                msq = jax.lax.psum(jnp.sum(d * d * m), axes) / cnt
                total += w * 0.5 * scale * jnp.log(msq + 1e-8)
            elif name == 'HEM':
                # HEM's mask is per-frame (ranking over h*w,
                # hard_example_mining.py:14-47) — shard-local; only the final
                # mean is global.  Decorrelate the random mask across shards.
                sub = jax.random.fold_in(
                    jax.random.fold_in(rng_loss,
                                       jax.lax.axis_index(data_axis)),
                    jax.lax.axis_index(time_axis))
                err = jnp.abs(d)
                h, ww = out.shape[-3], out.shape[-2]
                res = jnp.sum(err, axis=-1)
                flat = res.reshape(-1, h * ww)
                k = int(0.5 * h * ww)
                thre = (-jnp.sort(-flat, axis=1))[:, k]
                hmask = flat > thre[:, None]
                rand = jax.random.uniform(sub, flat.shape)
                k2 = int(0.1 * h * ww)
                if k2 > 0:
                    cutoff = jnp.sort(rand, axis=1)[:, k2 - 1]
                    hmask = hmask | (rand <= cutoff[:, None])
                hm = hmask.astype(err.dtype).reshape(res.shape)[..., None]
                total += w * jax.lax.psum(jnp.sum(err * hm * m), axes) / cnt
            else:
                raise ValueError(f'unsupported loss term for t-sharding: '
                                 f'{name}')
        return total

    def step_fn(state: TrainState, batch, rng) -> tuple[TrainState, dict]:
        gt = batch['gt']
        b, t = gt.shape[0], gt.shape[1]
        if task.kind == 'denoise':
            rng_sigma, rng_noise, rng_loss = jax.random.split(rng, 3)
            lo, hi = task.sigma_range
            sigma = jax.random.uniform(rng_sigma, (b, 1, 1, 1, 1),
                                       minval=lo, maxval=hi)
            noise = jax.random.normal(rng_noise, gt.shape, gt.dtype) * sigma
            lq = gt + noise
            noise_map = jnp.broadcast_to(
                sigma.astype(gt.dtype), (b, t) + gt.shape[2:4] + (1,))
        else:
            lq = batch['lq']
            rng_loss = rng
            noise_map = None

        clip_spec = P(data_axis, time_axis)
        in_specs = (P(), clip_spec, clip_spec,
                    clip_spec if noise_map is not None else P(), P())
        # check_vma=False: the fused forward's pallas_calls don't annotate
        # varying-mesh-axes on their out_shapes (jax 0.9 rejects them under
        # the default VMA tracking); correctness vs the single-device step
        # is asserted by tests/test_multichip.py instead.
        try:
            sharded_loss = shard_map(local_loss, mesh=mesh,
                                     in_specs=in_specs, out_specs=P(),
                                     check_vma=False)
        except TypeError:  # older jax without check_vma
            sharded_loss = shard_map(local_loss, mesh=mesh,
                                     in_specs=in_specs, out_specs=P())

        def compute_loss(params):
            return sharded_loss(params, lq, gt, noise_map, rng_loss)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        return new_state, {'loss': loss, 'grad_norm': gnorm}

    repl = NamedSharding(mesh, P())
    clip_sh = NamedSharding(mesh, P(data_axis, time_axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, clip_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
