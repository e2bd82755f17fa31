"""Kernel-design micro-benchmarks (TPU): conv-as-matmul orientations at the
TFR U-Net channel widths, Pallas DMA of unpadded channel minors, and im2col
patch assembly cost.  Informs the fused plain-CAB kernel design (PERF.md).

Run: python tools/microbench.py  (needs the TPU; one process at a time).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    # fence: device->host fetch (block_until_ready unreliable on this relay)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:<46s} {dt * 1e3:8.3f} ms')
    return dt


def chain(fn, reps=8):
    """Repeat fn reps times inside one jit with a data dependency, to
    amortize the ~1-3 ms per-call dispatch of this backend."""
    def run(x):
        acc = jnp.float32(0)
        for _ in range(reps):
            y = fn(x)
            s = jnp.sum(y[..., :1, :1].astype(jnp.float32))
            acc = acc + s
            x = x + (acc * 1e-37).astype(x.dtype)  # dependency, ~0 value
        return acc
    return run


def main():
    t, h, w, c = 16, 384, 1280, 24
    reps = 8
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (t, h, w, c), jnp.bfloat16)
    m = t * h * w

    print(f'== conv3x3 formulations at ({t},{h},{w},{c}) bf16, per-op ms ==')

    # XLA conv baseline (what the model currently does)
    wk = jax.random.uniform(key, (3, 3, c, c), jnp.bfloat16)

    def xla_conv(x):
        return jax.lax.conv_general_dilated(
            x, wk, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    d = timeit('xla conv3x3 NHWC', chain(xla_conv, reps), x) / reps
    print(f'    -> {2 * 9 * c * c * m / d / 1e12:.1f} TFLOP/s effective')

    # naive tap matmuls (M, c) @ (c, c)
    wt = jax.random.uniform(key, (9, c, c), jnp.bfloat16)

    def taps(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for i in range(9):
            dy, dx = divmod(i, 3)
            sl = jax.lax.slice(xp, (0, dy, dx, 0), (t, dy + h, dx + w, c))
            r = jax.lax.dot_general(sl.reshape(m, c), wt[i],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = r if acc is None else acc + r
        return acc.astype(jnp.bfloat16).reshape(t, h, w, c)
    d = timeit('tap matmuls (M,24)@(24,24) x9', chain(taps, reps), x) / reps
    print(f'    -> {2 * 9 * c * c * m / d / 1e12:.1f} TFLOP/s effective')

    # im2col (M, 9c) @ (9c, c)
    wi = jax.random.uniform(key, (9 * c, c), jnp.bfloat16)

    def im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [jax.lax.slice(xp, (0, dy, dx, 0), (t, dy + h, dx + w, c))
                for dy in range(3) for dx in range(3)]
        p = jnp.concatenate(cols, axis=-1).reshape(m, 9 * c)
        r = jax.lax.dot_general(p, wi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return r.astype(jnp.bfloat16).reshape(t, h, w, c)
    d = timeit('im2col (M,216)@(216,24)', chain(im2col, reps), x) / reps
    print(f'    -> {2 * 9 * c * c * m / d / 1e12:.1f} TFLOP/s effective')

    # s2d(2x2): (M/4, 16c) @ (16c, 4c) — same real conv, packed channels
    ws = jax.random.uniform(key, (16 * c, 4 * c), jnp.bfloat16)
    xs = x.reshape(t, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(t, h // 2, w // 2, 4 * c)

    def s2d_conv(xs):
        xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # 4x4-pixel support == 2x2 s2d blocks; emulate with 4 block taps
        cols = [jax.lax.slice(
            xp, (0, dy, dx, 0), (t, dy + h // 2, dx + w // 2, 4 * c))
            for dy in range(2) for dx in range(2)]
        p = jnp.concatenate(cols, axis=-1).reshape(m // 4, 16 * c)
        r = jax.lax.dot_general(p, ws, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return r.astype(jnp.bfloat16).reshape(t, h // 2, w // 2, 4 * c)
    d = timeit('s2d2x2 (M/4,384)@(384,96)', chain(s2d_conv, reps), xs) / reps
    print(f'    -> real {2 * 9 * c * c * m / d / 1e12:.1f} TFLOP/s '
          f'(mxu {2 * 16 * c * 4 * c * m / 4 / d / 1e12:.1f})')

    # pure matmul peak check at these M
    a = jax.random.uniform(key, (m // 4, 512), jnp.bfloat16)
    b = jax.random.uniform(key, (512, 512), jnp.bfloat16)

    def mm(a):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
    d = timeit('dense (M/4,512)@(512,512)', chain(mm, reps), a) / reps
    print(f'    -> {2 * 512 * 512 * m / 4 / d / 1e12:.1f} TFLOP/s')

    print('== pallas DMA: unpadded channel minor ==')

    def copy_kernel(src_hbm, out_ref, buf, sem, *, rows):
        hi = pl.program_id(0)
        cp = pltpu.make_async_copy(src_hbm.at[0, pl.ds(hi * rows, rows)],
                                   buf, sem)
        cp.start()
        cp.wait()
        out_ref[0] = buf[...] * 2.0

    rows = 32
    try:
        fn = pl.pallas_call(
            functools.partial(copy_kernel, rows=rows),
            grid=(h // rows,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, rows, w, c), lambda hi: (0, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, h, w, c), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((rows, w, c), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())],
        )
        d = timeit('pallas copy x2 (rows,1280,24) unpadded',
                   chain(lambda x: fn(x[:1]), reps), x) / reps
        gb = h * w * c * 2 * 2 / 1e9
        print(f'    -> {gb / d:.0f} GB/s')
    except Exception as e:
        print(f'    unpadded DMA FAILED: {type(e).__name__}: {e}')

    print('== elementwise bandwidth reference ==')

    def ew(x):
        return x * 1.5 + 0.25
    d = timeit('xla elementwise (t,h,w,24)', chain(ew, reps), x) / reps
    print(f'    -> {t * h * w * c * 2 * 2 / d / 1e9:.0f} GB/s (dense-bytes)')
    xp128 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 104)))
    d = timeit('xla elementwise (t,h,w,128)', chain(ew, reps), xp128) / reps
    print(f'    -> {t * h * w * 128 * 2 * 2 / d / 1e9:.0f} GB/s')


if __name__ == '__main__':
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    main()
