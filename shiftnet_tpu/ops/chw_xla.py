"""Pure-XLA (jnp) equivalents of the packed-CHW Pallas kernels.

Used as the *backward* bodies of the fused ops' ``jax.custom_vjp`` rules
(``ops/chw_grad.py``): the forward runs the Pallas kernel, the backward
runs ``jax.vjp`` of the matching function here (rematerialized).  Unlike
the NHWC unfused path, these operate directly on the dense packed layout —
convs are tap-stacked ``dot_general`` contractions over dense HBM arrays,
so XLA maps them to the MXU without the 128-lane channel-padding blowup
that made the NHWC path glue-bound (PERF.md).

Every function must match its kernel's numerics (same op order, f32
accumulation, bf16 casts) — asserted by ``tests/test_chw_grad.py``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from shiftnet_tpu.ops.chw import (
    ChwTensor, LANE, conv_lhs, cpad16, flat_len, phase_taps, row_stride,
)


def _lane_ok_np(lp, ws, gw, gh, padr):
    lane_ok = np.zeros((1, lp), np.float32)
    body = np.zeros(((gh + 2 * padr), ws), np.float32)
    body[padr: padr + gh, :gw] = 1.0
    lane_ok[0, : (gh + 2 * padr) * ws] = body.reshape(-1)
    return lane_ok


def _tap_dot(src, taps, wl, cb, pad_lanes, lp, masked, gw, ws,
             chunk_rows=256):
    """f32-accumulated ``wl @ patch_stack`` -> (co, T, lp), with the tap
    stack materialized in <=``chunk_rows``-sublane chunks.

    The monolithic (T, kk*cb, lp) stack — and its same-size cotangent in
    the VJP — dominated train-step HBM (570 MB per 25-tap rep conv at
    T=16 patch 256, 64% allocator fragmentation); chunking bounds both
    while keeping a >=128-deep MXU contraction."""
    t = src.shape[0]
    colc = np.arange(lp, dtype=np.int64) % ws
    per = max(1, chunk_rows // cb)
    acc = None
    for i0 in range(0, len(taps), per):
        sub = taps[i0:i0 + per]
        pieces = []
        for blk, cdr, cdc in sub:
            off = pad_lanes + cdr * ws + cdc
            sl = jax.lax.slice(src, (0, blk * cb, off),
                               (t, (blk + 1) * cb, off + lp))
            if masked and cdc != 0:
                ok = ((colc + cdc >= 0) & (colc + cdc < gw)).reshape(
                    1, 1, lp)
                sl = sl * jnp.asarray(ok, sl.dtype)
            pieces.append(sl)
        patches = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=1)
        w_sub = wl[:, i0 * cb:(i0 + len(sub)) * cb]
        o = jax.lax.dot_general(w_sub, patches, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = o if acc is None else acc + o
    return acc  # (co, t, lp) f32


def conv_concat_chw_xla(xs: list[ChwTensor], kerns: list[jax.Array],
                        bias: jax.Array | None,
                        alpha: jax.Array | None) -> ChwTensor:
    """jnp equivalent of ``chw.conv_concat_chw``: per-input tap-dots
    accumulated in f32 BEFORE bias/PReLU/cast — the same op order as the
    kernel (and as a conv over the materialized concat)."""
    a = xs[0]
    pf, cb, ws, gw, gh, padr = a.pf, a.cb, a.ws, a.gw, a.gh, a.padr
    dtype = a.data.dtype
    k = kerns[0].shape[0]
    c_out = kerns[0].shape[3]
    cb_out = cpad16(c_out)
    masked = (ws == gw)
    lp = a.data.shape[2]

    wls = [conv_lhs(kj, dtype) for kj in kerns]
    tbl = phase_taps(pf, pf, k, 1, k // 2)
    halo = max(1, max(abs(cd) for tp in tbl.values() for _, cd, _ in tp))
    assert padr >= halo, (padr, halo)
    pad_lanes = halo * ws + halo
    srcs = [jnp.pad(x.data, ((0, 0), (0, 0), (pad_lanes, pad_lanes)))
            for x in xs]

    lane_ok = jnp.asarray(_lane_ok_np(lp, ws, gw, gh, padr), jnp.float32)
    blocks = []
    for ai in range(pf):
        for bi in range(pf):
            o = None
            for src, wl in zip(srcs, wls):
                oj = _tap_dot(src, tbl[(ai, bi)], wl, cb, pad_lanes, lp,
                              masked, gw, ws)
                o = oj if o is None else o + oj
            o = jnp.transpose(o, (1, 0, 2))
            if bias is not None:
                o = o + bias.astype(jnp.float32).reshape(1, c_out, 1)
            if alpha is not None:
                a_s = alpha.astype(jnp.float32).reshape(())
                o = jnp.maximum(o, 0) + a_s * jnp.minimum(o, 0)
            o = (o * lane_ok).astype(dtype)
            o = jnp.pad(o, ((0, 0), (0, cb_out - c_out), (0, 0)))
            blocks.append(o)
    out = jnp.concatenate(blocks, axis=1)
    return ChwTensor(out, a.h, a.w, padr, pf, c_out)


def conv_chw_xla(x: ChwTensor, kern: jax.Array, bias: jax.Array | None,
                 alpha: jax.Array | None, *, stride: int = 1) -> ChwTensor:
    """jnp equivalent of ``chw.conv_chw`` (generic phase-packed conv)."""
    t = x.t
    pf, cb, ws, gw, gh, padr = x.pf, x.cb, x.ws, x.gw, x.gh, x.padr
    dtype = x.data.dtype
    k = kern.shape[0]
    pad = k // 2 if stride == 1 else (1 if k == 3 else 0)
    c_out = kern.shape[3]
    pf_out = pf // stride
    cb_out = cpad16(c_out)
    masked = (ws == gw)
    lp = x.data.shape[2]

    wlhs = conv_lhs(kern, dtype)              # (c_out, k*k*cb)
    tbl = phase_taps(pf, pf_out, k, stride, pad)
    halo = max(1, max(abs(cd) for tp in tbl.values() for _, cd, _ in tp))
    assert padr >= halo, (padr, halo)
    pad_lanes = halo * ws + halo
    src = jnp.pad(x.data, ((0, 0), (0, 0), (pad_lanes, pad_lanes)))

    lane_ok = jnp.asarray(_lane_ok_np(lp, ws, gw, gh, padr), jnp.float32)
    blocks = []
    for a in range(pf_out):
        for b in range(pf_out):
            o = _tap_dot(src, tbl[(a, b)], wlhs, cb, pad_lanes, lp,
                         masked, gw, ws)                 # (c_out, T, lp)
            o = jnp.transpose(o, (1, 0, 2))
            if bias is not None:
                o = o + bias.astype(jnp.float32).reshape(1, c_out, 1)
            if alpha is not None:
                a_s = alpha.astype(jnp.float32).reshape(())
                o = jnp.maximum(o, 0) + a_s * jnp.minimum(o, 0)
            o = (o * lane_ok).astype(dtype)
            o = jnp.pad(o, ((0, 0), (0, cb_out - c_out), (0, 0)))
            blocks.append(o)
    out = jnp.concatenate(blocks, axis=1)
    lp_out = flat_len(gh, gw, padr)
    out = out[:, :, :lp_out] if lp_out <= lp else jnp.pad(
        out, ((0, 0), (0, 0), (0, lp_out - lp)))
    return ChwTensor(out, x.h // stride, x.w // stride, padr, pf_out, c_out)


def _ca_mlp_xla(sums: jax.Array, n_px: int, du1, du2, dtype) -> jax.Array:
    mean = (sums / n_px).astype(dtype)
    z = jax.lax.dot_general(mean, du1.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = jnp.maximum(z.astype(dtype), 0)
    z = jax.lax.dot_general(z, du2.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(z.astype(dtype))


def cab_chw_xla(x: ChwTensor, params: dict[str, Any], *,
                reduction: int) -> ChwTensor:
    """jnp equivalent of ``chw.cab_chw``: conv3x3 -> PReLU -> conv3x3 ->
    CALayer -> residual, on the packed layout."""
    dtype = x.data.dtype
    w1 = params['body__0']['conv']['kernel']
    alpha = params['body__1']['weight']
    w2 = params['body__2']['conv']['kernel']
    y1 = conv_chw_xla(x, w1, None, alpha)
    s = conv_chw_xla(y1, w2, None, None)
    # channel sums over valid pixels (pads are zero)
    t = x.t
    pp = x.pf * x.pf
    sd = s.data.reshape(t, pp, s.cb, -1).astype(jnp.float32)
    sums = jnp.sum(sd, axis=(1, 3))[:, :s.c]                  # (T, C)
    du1 = params['CA']['conv_du__0']['conv']['kernel']
    du2 = params['CA']['conv_du__2']['conv']['kernel']
    ca = _ca_mlp_xla(sums, x.h * x.w,
                     du1.reshape(du1.shape[2], du1.shape[3]),
                     du2.reshape(du2.shape[2], du2.shape[3]), dtype)
    ca_full = jnp.zeros((t, pp, s.cb), ca.dtype).at[:, :, :s.c].set(
        ca[:, None, :]).reshape(t, pp * s.cb, 1)
    out = x.data + s.data * ca_full.astype(dtype)
    return ChwTensor(out, x.h, x.w, x.padr, x.pf, x.c)


def naf_cab_chw_xla(y: ChwTensor, hw: ChwTensor | None,
                    params: dict[str, Any], *, groups: int,
                    mid_ca: bool = False, use_last_bias: bool = False,
                    eps: float = 1e-6) -> ChwTensor:
    """jnp equivalent of ``naf_chw.naf_cab_chw`` (CAB1/CAB2 on the packed
    layout), mirroring the kernel chain on the SAME prepped weight
    matrices (``prep_naf_weights``): LN-folded expand -> dw3x3 ->
    SimpleGate -> [mid CA] -> merged RepConv -> expand -> SimpleGate2 ->
    CA -> residual projection."""
    from shiftnet_tpu.ops.naf_chw import (_naf_mlp, dw3x3_chw,
                                          prep_naf_weights)
    t = y.t
    pf, n, cb, ws, gw, gh, padr = (y.pf, y.c, y.cb, y.ws, y.gw, y.gh,
                                   y.padr)
    dtype = y.data.dtype
    f32 = jnp.float32
    pp = pf * pf
    lp = y.data.shape[2]
    add_c = 0 if hw is None else hw.c
    hcb = hw.cb if hw is not None else 16
    cin = n + add_c
    half = n // 2
    wts = prep_naf_weights(params, n, add_c, groups, dtype, cb, hcb)
    lane_ok = jnp.asarray(_lane_ok_np(lp, ws, gw, gh, padr), f32)

    d = y.data.reshape(t, pp, cb, lp)
    if hw is not None:
        hw2 = dw3x3_chw(hw, params['dwc'].reshape(3, 3, add_c))
        h2 = hw2.data.reshape(t, pp, hw.cb, lp)

    # expand per chunk (matmul in compute dtype, f32 accumulation), LN
    # folded as a per-pixel affine; the appended ones-row gives s1.
    es = []
    s2 = jnp.sum(jnp.square(d.astype(f32)), axis=2, keepdims=True)
    if hw is not None:
        s2 = s2 + jnp.sum(jnp.square(h2.astype(f32)), axis=2,
                          keepdims=True)
    for k in range(2):
        e = jax.lax.dot_general(
            wts['wa'][k], d, (((1,), (2,)), ((), ())),
            preferred_element_type=f32)              # (nr, t, pp, lp)
        e = jnp.transpose(e, (1, 2, 0, 3))
        if hw is not None:
            eb = jax.lax.dot_general(
                wts['wb'][k], h2, (((1,), (2,)), ((), ())),
                preferred_element_type=f32)
            e = e + jnp.transpose(eb, (1, 2, 0, 3))
        s1 = e[:, :, n:n + 1]
        mu = s1 / cin
        var = s2 / cin - mu * mu
        inv = jax.lax.rsqrt(var + eps)
        ek = inv * e[:, :, :n] - (inv * mu) * wts['c1'][k].reshape(1, 1, n, 1) \
            + wts['c2'][k].reshape(1, 1, n, 1)
        ek = (ek * lane_ok).astype(dtype)
        es.append(ek)
    # reassemble torch channel order: chunk k rows -> [k*half) u [n+k*half)
    e_full = jnp.concatenate([es[0][:, :, :half], es[1][:, :, :half],
                              es[0][:, :, half:], es[1][:, :, half:]],
                             axis=2)                 # (t, pp, 2n, lp)

    # RepConv2: depthwise 3x3 + identity over the 2n expand channels
    cb2 = cpad16(2 * n)
    ef = jnp.pad(e_full, ((0, 0), (0, 0), (0, cb2 - 2 * n), (0, 0)))
    e_chw = ChwTensor(ef.reshape(t, pp * cb2, lp), y.h, y.w, padr, pf,
                      2 * n)
    dvals = dw3x3_chw_f32(e_chw, params['dw0'])      # (t, pp, cb2, lp) f32
    dvals = dvals[:, :, :2 * n] + e_full.astype(f32)
    g = (dvals[:, :, :n] * dvals[:, :, n:]).astype(dtype)
    g = g * jnp.asarray(lane_ok, dtype)

    n_px = y.h * y.w
    if mid_ca:
        gsums = jnp.sum(g.astype(f32), axis=(1, 3))  # (t, n)
        cag = _naf_mlp(gsums, n_px, params['du1m'], params['du2m'], dtype)
        g = g * cag[:, None, :, None].astype(dtype)

    # merged RepConv (25-tap block-diagonal dense) as phase-tap matmuls
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, cb - n), (0, 0)))
    gd = gp.reshape(t, pp * cb, lp)
    tbl = phase_taps(pf, pf, 5, 1, 2)
    halo = max(abs(cd) for tp in tbl.values() for _, cd, _ in tp)
    pad_lanes = halo * ws + halo
    src = jnp.pad(gd, ((0, 0), (0, 0), (pad_lanes, pad_lanes)))
    masked = (ws == gw)
    rs = []
    for a in range(pf):
        for b in range(pf):
            r = _tap_dot(src, tbl[(a, b)], wts['rep'], cb, pad_lanes, lp,
                         masked, gw, ws)             # (n, t, lp)
            rb = jnp.transpose(r, (1, 0, 2)).astype(dtype)
            e2 = jax.lax.dot_general(
                wts['w4'], rb, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)          # (2n, t, lp)
            e2 = jnp.transpose(e2, (1, 0, 2))
            sv = (e2[:, :n].astype(dtype)
                  * jax.nn.sigmoid(e2[:, n:]).astype(dtype))
            sv = sv * jnp.asarray(lane_ok, dtype)
            rs.append(sv[:, None])
    s = jnp.concatenate(rs, axis=1)                  # (t, pp, n, lp)

    ca = _naf_mlp(jnp.sum(s.astype(f32), axis=(1, 3)), n_px,
                  params['du1'], params['du2'], dtype)
    scaled = s * ca[:, None, :, None].astype(dtype)
    y7 = jax.lax.dot_general(
        wts['w7'][:, :n], scaled, (((1,), (2,)), ((), ())),
        preferred_element_type=f32)                  # (n, t, pp, lp)
    y7 = jnp.transpose(y7, (1, 2, 0, 3))
    b7 = wts['b7'] if use_last_bias else jnp.zeros((n, 1), f32)
    y7 = (y7 + b7.reshape(1, 1, n, 1)) * wts['beta'].reshape(1, 1, n, 1)
    y7 = y7 * lane_ok
    out = (d[:, :, :n].astype(f32) + y7).astype(dtype)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, cb - n), (0, 0)))
    return ChwTensor(out.reshape(t, pp * cb, lp), y.h, y.w, padr, pf, n)


def dw3x3_chw_f32(x: ChwTensor, w: jax.Array) -> jax.Array:
    """Depthwise 3x3 like ``naf_chw.dw3x3_chw`` but returning the f32
    accumulator reshaped (T, pp, cb, lp) (the gate kernel keeps the dw
    output in f32 through the SimpleGate product)."""
    pf, ws, gw, gh, padr = x.pf, x.ws, x.gw, x.gh, x.padr
    t, nch, lp = x.data.shape
    cb, c = x.cb, x.c
    pp = pf * pf
    taps = [phase_taps(pf, pf, 3, 1, 1)[(a, b)] for a in range(pf)
            for b in range(pf)]
    pad_lanes = 2 * ws
    slack = ws - gw
    src = jnp.pad(x.data, ((0, 0), (0, 0), (pad_lanes, pad_lanes)))
    src = src.reshape(t, pp, cb, -1)
    wt = jnp.asarray(w, jnp.float32).reshape(9, c)
    colc = np.arange(lp, dtype=np.int64) % ws

    outs = []
    for p in range(pp):
        acc = None
        for i, (blk, cdr, cdc) in enumerate(taps[p]):
            off = pad_lanes + cdr * ws + cdc
            sl = jax.lax.slice(src, (0, blk, 0, off),
                               (t, blk + 1, c, off + lp))
            term = sl.astype(jnp.float32) * wt[i].reshape(1, 1, c, 1)
            if abs(cdc) > slack:
                ok = ((colc + cdc >= 0) & (colc + cdc < gw)).reshape(
                    1, 1, 1, lp)
                term = term * jnp.asarray(ok, jnp.float32)
            acc = term if acc is None else acc + term
        outs.append(jnp.pad(acc, ((0, 0), (0, 0), (0, cb - c), (0, 0))))
    return jnp.concatenate(outs, axis=1)


def up_skip_chw_xla(x: ChwTensor, params: dict[str, Any],
                    skip: ChwTensor) -> ChwTensor:
    """jnp equivalent of ``chw.up_skip_chw``: conv1x1 (commuted) ->
    bilinear up2x (torch half-pixel, edge clamp) -> + skip."""
    from shiftnet_tpu.ops.chw import repad_chw
    x = repad_chw(x, skip.padr)  # match the kernel's layout normalization
    t = x.t
    pf, cb, ws, gw, gh, padr = x.pf, x.cb, x.ws, x.gw, x.gh, x.padr
    dtype = x.data.dtype
    pf_out = 2 * pf
    c_out = skip.c
    cb_out = skip.cb
    masked = (ws == gw)
    lp = x.data.shape[2]
    f32 = jnp.float32

    kern = params['up__1']['conv']['kernel']
    c_in = kern.shape[2]
    w11 = jnp.zeros((cb, c_out), kern.dtype).at[:c_in].set(
        kern.reshape(c_in, c_out)).astype(dtype)

    # 1x1 per phase
    d = x.data.reshape(t, pf * pf, cb, lp)
    z = jax.lax.dot_general(
        d, w11, (((2,), (0,)), ((), ())),
        preferred_element_type=f32)                    # (t, pp, lp, c_out)
    z = jnp.transpose(z, (0, 1, 3, 2)).astype(dtype)   # (t, pp, c_out, lp)

    pad_lanes = ws + 1
    zp = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (pad_lanes, pad_lanes)))
    ri = np.arange(lp, dtype=np.int64)
    cell_row = ri // ws - padr
    cell_col = ri % ws
    m_top = jnp.asarray((cell_row == 0).reshape(1, 1, lp), f32)
    m_bot = jnp.asarray((cell_row == gh - 1).reshape(1, 1, lp), f32)
    m_l = jnp.asarray((cell_col == 0).reshape(1, 1, lp), f32)
    m_r = jnp.asarray((cell_col == gw - 1).reshape(1, 1, lp), f32)

    def zsl(ph_r, ph_c, cdr, cdc):
        blk = ph_r * pf + ph_c
        off = pad_lanes + cdr * ws + cdc
        piece = jax.lax.slice(zp, (0, blk, 0, off),
                              (t, blk + 1, c_out, off + lp))[:, 0]
        if masked and cdc != 0:
            ok = ((cell_col + cdc >= 0) & (cell_col + cdc < gw))
            piece = piece * jnp.asarray(ok.reshape(1, 1, lp), dtype)
        return piece.astype(f32)

    lane_ok = jnp.asarray(_lane_ok_np(lp, ws, gw, gh, padr), f32)
    blocks = []
    for a in range(pf_out):
        nr_r = a // 2
        if a % 2 == 0:
            nb_roff, nb_r = divmod(a // 2 - 1, pf)
            rmask = m_top if a == 0 else None
        else:
            nb_roff, nb_r = divmod(a // 2 + 1, pf)
            rmask = m_bot if a == pf_out - 1 else None
        for b in range(pf_out):
            nr_c = b // 2
            if b % 2 == 0:
                nb_coff, nb_c = divmod(b // 2 - 1, pf)
                cmask = m_l if b == 0 else None
            else:
                nb_coff, nb_c = divmod(b // 2 + 1, pf)
                cmask = m_r if b == pf_out - 1 else None

            def rowblend(ph_c, coff):
                v = (0.75 * zsl(nr_r, ph_c, 0, coff)
                     + 0.25 * zsl(nb_r, ph_c, nb_roff, coff))
                if rmask is not None:
                    v = v + 0.25 * rmask * zsl(nr_r, ph_c, 0, coff)
                return v

            out = 0.75 * rowblend(nr_c, 0) + 0.25 * rowblend(nb_c, nb_coff)
            if cmask is not None:
                out = out + 0.25 * cmask * rowblend(nr_c, 0)
            out = out * lane_ok.reshape(1, 1, lp)
            out = jnp.pad(out, ((0, 0), (0, cb_out - c_out), (0, 0)))
            blocks.append(out)
    up = jnp.concatenate(blocks, axis=1)
    # kernel adds the skip in f32 and casts once on store
    out = (up + skip.data.astype(f32)).astype(dtype)
    return ChwTensor(out, skip.h, skip.w, padr, pf_out, c_out)
