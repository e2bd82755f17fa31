"""Probe: NCHW fused-CAB kernel correctness (CPU interpret) + TPU timing,
and Mosaic strided lane/sublane slice support (for downsample/upsample).

Run: python tools/probe_chw.py [cpu|tpu|stride]
"""
import functools
import sys
import time

import numpy as np


def _setup(cpu: bool):
    import os
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
    import jax
    if cpu:
        jax.config.update('jax_default_device', jax.devices('cpu')[0])
    jax.config.update('jax_compilation_cache_dir',
                      os.environ['JAX_COMPILATION_CACHE_DIR'])
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    return jax


def check_cpu():
    jax = _setup(cpu=True)
    import jax.numpy as jnp
    from shiftnet_tpu.models.layers import CAB
    from shiftnet_tpu.ops import chw

    for (t, h, w, c) in [(3, 16, 96, 24), (2, 12, 130, 16)]:
        mod = CAB(c, kernel_size=3, reduction=4, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (t, h, w, c), jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(1), x)['params']
        ref = mod.apply({'params': params}, x)

        xc = chw.from_nhwc(x, padr=2)
        out = chw.cab_chw(xc, params, reduction=4, interpret=True)
        got = chw.to_nhwc(out)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
        print(f'cab_chw ({t},{h},{w},{c}): max abs err {err:.3e} rel {rel:.3e}')
        assert rel < 2e-2, rel  # bf16 paths, tiny diffs from assoc order


def bench_tpu():
    jax = _setup(cpu=False)
    import jax.numpy as jnp
    from shiftnet_tpu.models.layers import CAB
    from shiftnet_tpu.ops import chw

    t, h, w, c = 8, 384, 1280, 24
    mod = CAB(c, kernel_size=3, reduction=4, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t, h, w, c), jnp.bfloat16)
    params = jax.jit(mod.init)(jax.random.PRNGKey(1), x[:1, :16, :16])['params']

    def chain(fn, reps=8):
        def run(x):
            acc = jnp.float32(0)
            for _ in range(reps):
                y = fn(x)
                s = jnp.sum(y[..., :1, :1].astype(jnp.float32))
                acc = acc + s
                x = x + (acc * 1e-37).astype(x.dtype)
            return acc
        return run

    def timeit(name, fn, *args, iters=10):
        f = jax.jit(fn)
        out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f'{name:<40s} {dt * 1e3:8.3f} ms', flush=True)
        return dt

    reps = 8
    # XLA NHWC CAB baseline
    d = timeit('xla CAB NHWC (8,384,1280,24)',
               chain(lambda v: mod.apply({'params': params}, v), reps), x)
    print(f'    -> {d / reps * 1e3:.3f} ms per CAB, '
          f'{d / reps / t * 1e3:.3f} ms/frame')

    # NCHW fused path (stay in ChwTensor across reps: measures steady state)
    xc = chw.from_nhwc(x, padr=2)

    def fused(data):
        xt = chw.ChwTensor(data, h, w, 2)
        for _ in range(reps):
            xt = chw.cab_chw(xt, params, reduction=4, interpret=False)
        return xt.data
    d = timeit('chw fused CAB x8', fused, xc.data)
    print(f'    -> {d / reps * 1e3:.3f} ms per CAB, '
          f'{d / reps / t * 1e3:.3f} ms/frame')

    # correctness on TPU too
    ref = jax.jit(lambda v: mod.apply({'params': params}, v))(x)
    got = chw.to_nhwc(chw.cab_chw(xc, params, reduction=4, interpret=False))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f'tpu max abs err vs XLA: {err:.3e}')


def probe_stride():
    jax = _setup(cpu=False)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, m = 24, 2560
    x = jnp.arange(c * m, dtype=jnp.float32).reshape(c, m).astype(jnp.bfloat16)

    def k_lane_stride(x_ref, o_ref):
        o_ref[...] = jax.lax.slice(x_ref[...], (0, 0), (c, m), (1, 2))

    try:
        out = pl.pallas_call(
            k_lane_stride,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, m // 2), jnp.bfloat16),
        )(x)
        ok = np.allclose(np.asarray(out, np.float32),
                         np.asarray(x, np.float32)[:, ::2])
        print(f'lane-strided slice: OK correct={ok}')
    except Exception as e:
        print(f'lane-strided slice FAILED: {type(e).__name__}: {e}')

    def k_sub_stride(x_ref, o_ref):
        v = x_ref[...].reshape(c, m // 128, 128)
        o_ref[...] = jax.lax.slice(
            v, (0, 0, 0), (c, m // 128, 128), (1, 2, 1)).reshape(c, m // 2)

    try:
        out = pl.pallas_call(
            k_sub_stride,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, m // 2), jnp.bfloat16),
        )(x)
        print('sublane-strided slice: OK')
    except Exception as e:
        print(f'sublane-strided slice FAILED: {type(e).__name__}')

    # strided store (interleave): out[:, ::2] = a
    def k_store(a_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        idx = (slice(None), pl.Slice(0, m // 2, 2))
        o_ref[idx] = a_ref[...]

    a = x[:, : m // 2]
    try:
        out = pl.pallas_call(
            k_store,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, m), jnp.bfloat16),
        )(a)
        ok = np.allclose(np.asarray(out, np.float32)[:, ::2],
                         np.asarray(a, np.float32))
        print(f'lane-strided store: OK correct={ok}')
    except Exception as e:
        print(f'lane-strided store FAILED: {type(e).__name__}: {e}')

    # XLA-side strided slice cost on a flat tensor
    big = jnp.zeros((16, 24, 384 * 1280), jnp.bfloat16)

    def xla_dein(v):
        return v[..., ::2] * 1.5

    f = jax.jit(xla_dein)
    out = f(big)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(big)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 10
    gb = big.size * 2 * 1.5 / 1e9
    print(f'xla flat deinterleave (16,24,384*1280): {dt*1e3:.3f} ms '
          f'({gb/dt:.0f} GB/s dense)')


if __name__ == '__main__':
    sys.path.insert(0, __file__.rsplit('/', 2)[0])
    mode = sys.argv[1] if len(sys.argv) > 1 else 'cpu'
    if mode == 'cpu':
        check_cpu()
    elif mode == 'tpu':
        bench_tpu()
    elif mode == 'stride':
        probe_stride()
