"""TPU timing probe: XLA shift-op variants on the packed layout.

The per-round XLA ops (temporal shift + fused extract/spatial shift,
``ops/naf_chw.py``) are ~20-25% of a shift round at the 720p L1 shape.
This probe A/Bs reformulations of ``gsts_hw_chw`` that change what XLA
materializes:

  A: shipping form (whole-tensor lane pad, post-hoc lane_ok multiply)
  B: per-piece lane_ok (mask fused into each concat operand)
  C: band-limited pad (pad only the add_c channel band, not all nch rows)
  D: B + C

Run: python tools/probe_shift.py [t]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from shiftnet_tpu.ops import chw, naf_chw
from shiftnet_tpu.ops.chw import ChwTensor, cpad16
from shiftnet_tpu.ops.shift import shift_dir_table


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f'{name}: {dt * 1e3:.2f} ms')
    return dt


def gsts_hw_variant(y: ChwTensor, add_c: int, number: int, *, reverse: bool,
                    piece_mask: bool, band_pad: bool) -> ChwTensor:
    pf, ws, gw, gh, padr = y.pf, y.ws, y.gw, y.gh, y.padr
    t, nch, lp = y.data.shape
    cb = y.cb
    s = 8 // pf
    slack = ws - gw
    pad_lanes = s * ws + s
    colc = np.arange(lp, dtype=np.int64) % ws
    dtype = y.data.dtype
    base = 0 if not reverse else y.c - add_c
    hcb = cpad16(add_c)
    lane_ok = naf_chw._lane_ok(lp, ws, gw, gh, padr, dtype)

    if band_pad:
        # pad ONLY the needed channel band: (t, pp, add_c, lp) source.
        d = y.data.reshape(t, pf * pf, cb, lp)[:, :, base:base + add_c]
        src = jnp.pad(d, ((0, 0), (0, 0), (0, 0), (pad_lanes, pad_lanes)))
    else:
        src = jnp.pad(y.data, ((0, 0), (0, 0), (pad_lanes, pad_lanes)))

    blocks = []
    zpad = jnp.zeros((t, hcb - add_c, lp), dtype)
    for p in range(pf * pf):
        for c0, csz, dy, dx in shift_dir_table(number):
            if csz == 0:
                continue
            dc = dx // pf
            off = pad_lanes - (dy // pf) * ws - dc
            if band_pad:
                sl = jax.lax.slice(src, (0, p, c0, off),
                                   (t, p + 1, c0 + csz, off + lp))[:, 0]
            else:
                r0 = p * cb + base + c0
                sl = jax.lax.slice(src, (0, r0, off),
                                   (t, r0 + csz, off + lp))
            if abs(dc) > slack:
                ok = ((colc - dc >= 0) & (colc - dc < gw)).reshape(1, 1, lp)
                sl = sl * jnp.asarray(ok, dtype)
            if piece_mask:
                sl = sl * lane_ok
            blocks.append(sl)
        if hcb != add_c:
            blocks.append(zpad)
    out = jnp.concatenate(blocks, axis=1)
    if not piece_mask:
        out = out * lane_ok
    return ChwTensor(out, y.h, y.w, padr, pf, add_c)


def temporal_shift_slices(x: ChwTensor, *, reverse: bool = False,
                          boundary_patch: bool = True) -> ChwTensor:
    """Roll/where-free temporal shift: per-half frame-sliced concats (the
    boundary patch becomes the first/last concat piece instead of a
    whole-tensor select over a rolled copy)."""
    n = x.c
    cb = x.cb
    half = n // 2
    pp = x.pf * x.pf
    t = x.t
    d = x.data.reshape(t, pp, cb, -1)
    pad = d[:, :, n:]
    if not reverse:
        if boundary_patch:
            p1 = jnp.concatenate([d[0:1, :, 0:half], d[0:t - 1, :, half:n]],
                                 axis=0)
            p2 = jnp.concatenate([d[0:1, :, half:n], d[1:t, :, 0:half]],
                                 axis=0)
        else:
            p1 = jnp.concatenate([d[t - 1:t, :, half:n],
                                  d[0:t - 1, :, half:n]], axis=0)
            p2 = d[:, :, 0:half]
    else:
        if boundary_patch:
            p1 = jnp.concatenate([d[0:t - 1, :, half:n],
                                  d[t - 1:t, :, 0:half]], axis=0)
            p2 = jnp.concatenate([d[1:t, :, 0:half],
                                  d[t - 1:t, :, half:n]], axis=0)
        else:
            p1 = d[:, :, half:n]
            p2 = jnp.concatenate([d[1:t, :, 0:half], d[0:1, :, 0:half]],
                                 axis=0)
    y = jnp.concatenate([p1, p2, pad], axis=2)
    return ChwTensor(y.reshape(x.data.shape), x.h, x.w, x.padr, x.pf, x.c)


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = 80
    add_c = 40
    number = add_c // 8
    dt_ = jnp.bfloat16
    rng = np.random.default_rng(0)

    for lname, h, w, pf in [('L1', 360, 640, 2), ('L2', 180, 320, 1)]:
        print(f'--- {lname}: ({t},{h},{w},{n}) pf={pf} ---')
        x = jnp.asarray(rng.standard_normal((t, h, w, n)), dt_)
        xc = chw.from_nhwc(x, padr=4, pf=pf)

        @jax.jit
        def tshift(data):
            xt = ChwTensor(data, h, w, 4, pf, n)
            return naf_chw.temporal_shift_chw(xt, reverse=False,
                                              boundary_patch=True).data

        ydata = tshift(xc.data)
        timeit('temporal shift (roll+where)', tshift, xc.data)

        @jax.jit
        def tshift2(data):
            xt = ChwTensor(data, h, w, 4, pf, n)
            return temporal_shift_slices(xt, reverse=False,
                                         boundary_patch=True).data

        for rev in (False, True):
            for bp in (True, False):
                a = naf_chw.temporal_shift_chw(
                    ChwTensor(xc.data, h, w, 4, pf, n), reverse=rev,
                    boundary_patch=bp).data
                b = temporal_shift_slices(
                    ChwTensor(xc.data, h, w, 4, pf, n), reverse=rev,
                    boundary_patch=bp).data
                assert np.array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32)), (rev, bp)
        timeit('temporal shift (sliced concat)', tshift2, xc.data)

        def mk(piece_mask, band_pad):
            @jax.jit
            def f(data):
                yt = ChwTensor(data, h, w, 4, pf, n)
                return gsts_hw_variant(yt, add_c, number, reverse=False,
                                       piece_mask=piece_mask,
                                       band_pad=band_pad).data
            return f

        @jax.jit
        def cur(data):
            yt = ChwTensor(data, h, w, 4, pf, n)
            return naf_chw.gsts_hw_chw(yt, add_c, number, reverse=False).data

        ref = np.asarray(cur(ydata), np.float32)
        timeit('A gsts_hw (shipping)', cur, ydata)
        for name, pm, bp in [('B piece-mask', True, False),
                             ('C band-pad', False, True),
                             ('D piece-mask+band-pad', True, True)]:
            f = mk(pm, bp)
            got = np.asarray(f(ydata), np.float32)
            assert np.array_equal(ref, got), name
            timeit(name, f, ydata)


if __name__ == '__main__':
    main()
