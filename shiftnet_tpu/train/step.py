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
