"""In-Pallas matmul orientation microbenchmark: which dot shapes sustain
MXU throughput at the TFR U-Net channel widths (c=24..96)?  Informs the
NCHW fused-CAB kernel design.

Run: python tools/microbench_mm.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mm_loop_kernel(a_ref, b_ref, out_ref, acc_ref, *, iters):
    a0 = a_ref[...]
    b0 = b_ref[...]
    scale_a = a0.size <= b0.size

    def body(i, s):
        if scale_a:
            a, b = a0 * (1.0 + s * 1e-30).astype(a0.dtype), b0
        else:
            a, b = a0, b0 * (1.0 + s * 1e-30).astype(b0.dtype)
        r = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc_ref[...] += r
        return r[0, 0]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def bench_mm(name, m, k, n, iters=100, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (m, k), dtype)
    b = jax.random.uniform(key, (k, n), dtype)
    try:
        fn = pl.pallas_call(
            functools.partial(mm_loop_kernel, iters=iters),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), dtype),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
        )
        f = jax.jit(lambda a, b: fn(a, b))
        out = f(a, b)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = f(a, b)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps / iters
        tf = 2 * m * k * n / dt / 1e12
        print(f'{name:<44s} {dt * 1e6:9.1f} us  {tf:6.1f} TF/s', flush=True)
        return dt
    except Exception as e:
        print(f'{name:<44s} FAILED {type(e).__name__}', flush=True)
        return None


def main():
    print('== in-pallas dot_general orientations (bf16) ==')
    # methodology check: near-peak dense
    bench_mm('ref  (8192,512)@(512,512)', 8192, 512, 512, iters=30)
    bench_mm('ref  (512,512)@(512,8192)', 512, 512, 8192, iters=30)
    # aligned-shape sweeps around the TFR sizes
    bench_mm('aln  (8192,256)@(256,128)', 8192, 256, 128)
    bench_mm('aln  (128,256)@(256,8192)', 128, 256, 8192)
    bench_mm('aln  (8192,256)@(256,32)', 8192, 256, 32)
    # TFR conv1 as flat matmuls (unaligned K=216, small co=24)
    bench_mm('W@P  (24,216)@(216,10240)', 24, 216, 10240)
    bench_mm('P@W  (10240,216)@(216,24)', 10240, 216, 24)
    bench_mm('P@Wp (10240,216)@(216,128)', 10240, 216, 128)
    # s2d 2x2: effective c=96
    bench_mm('s2d  (96,384)@(384,5120)', 96, 384, 5120)
    bench_mm('s2d  (5120,384)@(384,96)', 5120, 384, 96)
    bench_mm('s2d  (5120,384)@(384,128)', 5120, 384, 128)
    # encoder2 widths (c=80, 1x1 to 160)
    bench_mm('c80  (10240,80)@(80,160)', 10240, 80, 160)
    bench_mm('c80  (10240,80)@(80,128)', 10240, 80, 128)


if __name__ == '__main__':
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from shiftnet_tpu.utils.jaxenv import setup_jax
    setup_jax()
    main()
