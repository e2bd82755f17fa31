"""Train-step time/memory profile (VERDICT r2 task 8).

Decomposes one deblur_plus train step (B=1 clip, T frames, patch^2, bf16
compute / f32 params + AdamW) into forward / forward+backward / full-step
timings, for the fused (packed-CHW custom-VJP) and unfused (XLA NHWC)
paths, and reports the device peak-memory stats after each phase.

The reference trains the exact ops it infers with in one autocast
forward/backward (``image_restoration_model.py:255-284``); this probe
answers "what does the fused kernel path buy the TRAIN step, and where
does backward time go" — fwd vs bwd vs optimizer.

Run: python tools/profile_train.py [fused|unfused|both] [T] [patch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from shiftnet_tpu.models import build_model, init_params
from shiftnet_tpu.train.optim import OptimConfig, build_optimizer
from shiftnet_tpu.train.step import TaskConfig, TrainState, make_train_step


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'  {name}: {dt * 1e3:.1f} ms')
    return dt


def mem(tag):
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get('peak_bytes_in_use', 0)
    print(f'  [{tag}] peak HBM: {peak / 2**30:.2f} GiB')


def profile(fused: bool, t: int, patch: int):
    name = 'fused' if fused else 'unfused'
    print(f'--- {name} (T={t}, {patch}x{patch}) ---')
    model = build_model('deblur_plus', dtype=jnp.bfloat16, fused_chw=fused)
    task = TaskConfig(kind='deblur', loss_spec='1*L1', center_slice=(1, 1))
    x0 = jnp.zeros((t, patch, patch, 3), jnp.bfloat16)
    params = init_params(model, x0)

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (t, patch, patch, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (t, patch, patch, 3)), jnp.float32)

    fb, ff = task.center_slice

    def loss_fn(p, lq, gt):
        out = model.apply({'params': p}, lq)
        return jnp.mean(jnp.abs(out.astype(jnp.float32)
                                - gt[fb: gt.shape[0] - ff]))

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.value_and_grad(loss_fn))
    d_fwd = timeit('forward only', fwd, params, lq, gt)
    mem('forward')
    d_grad = timeit('forward+backward', grad, params, lq, gt)
    mem('forward+backward')

    tx = build_optimizer(OptimConfig(total_iters=1000, grad_clip=0.01),
                         params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx, task))
    batch = {'lq': lq[None], 'gt': gt[None]}
    key = jax.random.PRNGKey(0)

    def run(state):
        s2, m = step(state, batch, key)
        return m['loss']

    d_step = timeit('full train step', run, state)
    mem('full step')
    print(f'  backward cost: {(d_grad - d_fwd) * 1e3:.1f} ms '
          f'({d_grad / max(d_fwd, 1e-9):.2f}x fwd); '
          f'optimizer+loss glue: {(d_step - d_grad) * 1e3:.1f} ms')
    return d_fwd, d_grad, d_step


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    patch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    if which in ('unfused', 'both'):
        profile(False, t, patch)
    if which in ('fused', 'both'):
        profile(True, t, patch)


if __name__ == '__main__':
    main()
