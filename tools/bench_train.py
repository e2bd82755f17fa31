"""Train-step microbenchmark: fused (packed-CHW + custom VJP) vs unfused.

Times one jitted deblur train step (B=1 clip, T frames, patch^2, bf16
compute / f32 params + AdamW) on the TPU, for both forward paths.

Run: python tools/bench_train.py [fused|unfused|both] [T] [patch]
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


def bench(fused: bool, t: int, patch: int, iters: int = 5):
    model = build_model('deblur_plus', dtype=jnp.bfloat16, fused_chw=fused)
    task = TaskConfig(kind='deblur', loss_spec='1*L1', center_slice=(1, 1))
    x0 = jnp.zeros((t, patch, patch, 3), jnp.bfloat16)
    params = init_params(model, x0)
    tx = build_optimizer(OptimConfig(total_iters=1000, grad_clip=0.01),
                         params)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx, task), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        'lq': jnp.asarray(rng.uniform(0, 1, (1, t, patch, patch, 3)),
                          jnp.float32),
        'gt': jnp.asarray(rng.uniform(0, 1, (1, t, patch, patch, 3)),
                          jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    loss0 = float(metrics['loss'])
    print(f'  compile+first step: {time.perf_counter() - t0:.1f}s '
          f'loss={loss0:.4f}')
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    loss = float(metrics['loss'])  # device->host fence
    dt = (time.perf_counter() - t0) / iters
    name = 'fused' if fused else 'unfused'
    print(f'{name} train step (T={t}, {patch}x{patch}): {dt * 1e3:.1f} ms '
          f'(loss {loss:.4f})')
    assert np.isfinite(loss)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    patch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    if which in ('unfused', 'both'):
        du = bench(False, t, patch)
    if which in ('fused', 'both'):
        df = bench(True, t, patch)
    if which == 'both':
        print(f'speedup: {du / df:.2f}x')


if __name__ == '__main__':
    main()
