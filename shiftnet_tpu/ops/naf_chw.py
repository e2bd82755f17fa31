"""Fused CHW Pallas kernels for the GShiftNet shift-block hot path.

Covers the reference ``CAB1``/``CAB2`` NAF-style gated blocks
(``gshift_deblur1.py:183-255``) and the surrounding grouped
spatial-temporal shift (``:440-547``), on the packed ChwTensor layout
(``ops/chw.py``).  Replaces the NHWC Pallas path (``ops/cab_pallas.py``),
which never beat XLA (PERF.md): NHWC pads C=80 to 128 lanes and pays an
HBM round trip per op; here tensors are dense, the temporal shift is a
cheap flat channel concat, the 24-direction spatial shift is an XLA
mask-accumulate over *aligned* cell slices, and each CAB body runs in
three kernels:

  gate kernel: [CAB2: depthwise 3x3 over the shifted channels] ->
    LayerNorm -> 1x1 expand -> RepConv2 (dw 3x3 + id) -> SimpleGate.
    The LN is algebraically folded into the expand matmul: LN statistics
    are per-pixel scalars, so  w0 @ LN(x) = inv*(w0*gamma @ x)
    - inv*mu*(w0@gamma) + w0@beta  — the MXU consumes RAW slab rows (no
    patch assembly for 1x1 convs) and a per-pixel affine fixes the result.
  rep kernel: [denoise mid-CA scale] -> RepConv as a single merged 25-tap
    block-diagonal dense matmul (5x5 grouped + 3x3 grouped + identity
    summed into one weight host-side) -> 1x1 expand -> SimpleGate2.
  back kernel: out = shortcut + beta * (w7 @ (s * ca) + b7).

Channel-attention MLPs (CALayer2, ``gshift_deblur1.py:71-87``) run on the
host on per-tile sums, exactly like the plain-CAB path.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shiftnet_tpu.ops.chw import (
    ChwTensor, LANE, TAIL, _col_index, _emit_tile, _interpret, _phases,
    col_slack_ok, cpad16, flat_len, phase_taps,
)
from shiftnet_tpu.ops.shift import shift_dir_table


# ---------------------------------------------------------------------------
# XLA-side shift ops on the flat layout (dense; no Pallas needed).
# ---------------------------------------------------------------------------


def _mosaic_params():
    """Per-kernel Mosaic scoped-VMEM limit — see chw.vmem_limit_mb (the
    "16 MB VMEM" wall of rounds 2-4 was Mosaic's default scoped limit,
    not hardware; the v5e has 128 MiB physical VMEM)."""
    from shiftnet_tpu.ops.chw import mosaic_params
    return mosaic_params()


def temporal_shift_chw(x: ChwTensor, *, reverse: bool = False,
                       boundary_patch: bool = True,
                       axis: str | None = None) -> ChwTensor:
    """Temporal half-channel shift (``gshift_deblur1.py:504-519``) on the
    flat layout: a channel-block concat across frames.  The boundary patch
    is a fused per-frame SELECT (not another whole-tensor concat — that
    cost a full extra HBM round trip, measured 7.7 -> ~2 ms/round at the
    720p L1 shape).

    ``axis``: mesh axis name when the frame axis is ``shard_map``-sharded
    (sequence-parallel training on the packed layout): the one-frame
    cross-shard movement is a ``ppermute`` of one edge frame's
    half-channel block — exact, mirroring ``ops/shift.py
    _temporal_channel_shift_sharded``; differentiable (ppermute transpose).
    """
    n = x.c
    cb = x.cb
    pp = x.pf * x.pf
    t = x.t
    d = x.data.reshape(t, pp, cb, -1)
    lo, hi = d[:, :, : n // 2], d[:, :, n // 2: n]
    pad = d[:, :, n:]
    if axis is not None:
        nsh = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        if not reverse:
            # y[t] = [hi[t-1], lo[t], pad]; local frame 0 needs the LEFT
            # neighbor's last frame (circular wrap == jnp.roll).
            recv = jax.lax.ppermute(
                hi[-1:], axis, [(i, (i + 1) % nsh) for i in range(nsh)])
            y = jnp.concatenate(
                [jnp.concatenate([recv, hi[:-1]], axis=0), lo, pad], axis=2)
            if boundary_patch:
                first = jnp.where(idx == 0, d[:1], y[:1])
                y = jnp.concatenate([first, y[1:]], axis=0)
        else:
            recv = jax.lax.ppermute(
                lo[:1], axis, [(i, (i - 1) % nsh) for i in range(nsh)])
            y = jnp.concatenate(
                [hi, jnp.concatenate([lo[1:], recv], axis=0), pad], axis=2)
            if boundary_patch:
                last = jnp.where(idx == nsh - 1, d[-1:], y[-1:])
                y = jnp.concatenate([y[:-1], last], axis=0)
        return ChwTensor(y.reshape(x.data.shape), x.h, x.w, x.padr, x.pf,
                         x.c)
    if not reverse:
        y = jnp.concatenate([jnp.roll(hi, 1, axis=0), lo, pad], axis=2)
        patch_frame = 0
    else:
        y = jnp.concatenate([hi, jnp.roll(lo, -1, axis=0), pad], axis=2)
        patch_frame = t - 1
    if boundary_patch:
        tmask = (jnp.arange(t) == patch_frame).reshape(t, 1, 1, 1)
        y = jnp.where(tmask, d, y)
    return ChwTensor(y.reshape(x.data.shape), x.h, x.w, x.padr, x.pf, x.c)


def extract_hw_chw(y: ChwTensor, add_c: int, *, reverse: bool) -> ChwTensor:
    """Slice the ``add_c`` temporally-moved channels (front for forward,
    back for reverse: ``gshift_deblur1.py:520-528``) into their own packed
    tensor."""
    cb = y.cb
    pp = y.pf * y.pf
    d = y.data.reshape(y.t, pp, cb, -1)
    hw = d[:, :, : add_c] if not reverse else d[:, :, y.c - add_c: y.c]
    hcb = cpad16(add_c)
    hw = jnp.pad(hw, ((0, 0), (0, 0), (0, hcb - add_c), (0, 0)))
    return ChwTensor(hw.reshape(y.t, pp * hcb, -1), y.h, y.w, y.padr,
                     y.pf, add_c)


def _lane_ok(lp, ws, gw, gh, padr, dtype):
    """(1, lp) validity mask restoring the layout's zero-pad invariant."""
    lane_ok = np.zeros((1, lp), np.float32)
    body = np.zeros(((gh + 2 * padr), ws), np.float32)
    body[padr: padr + gh, :gw] = 1.0
    lane_ok[0, : (gh + 2 * padr) * ws] = body.reshape(-1)
    return jnp.asarray(lane_ok, dtype)


def _shift_pieces(src, pad_lanes, base_rows, number, pf, ws, gw, slack,
                  lp, t, dtype, colc, lane_ok):
    """Per-direction channel-group slices of ``src`` (lane-padded), shifted,
    column-masked, and lane-validity-masked; returns them in channel order
    (they partition ``[0, 8*number)``).  Masks are applied per piece so XLA
    fuses them into the concat operands instead of a separate whole-tensor
    pass (measured -1 ms/round at the 720p L1 shape; a band-limited pad was
    also tried and was SLOWER — XLA's simplifier already folds the
    monolithic pad into the slices, while the band slice is a real copy)."""
    pieces = []
    for c0, csz, dy, dx in shift_dir_table(number):
        if csz == 0:
            continue
        assert dy % pf == 0 and dx % pf == 0
        dc = dx // pf
        off = pad_lanes - (dy // pf) * ws - dc
        sl = jax.lax.slice(src, (0, base_rows + c0, off),
                           (t, base_rows + c0 + csz, off + lp))
        if abs(dc) > slack:
            # out col cc reads source col cc - dc; out-of-image sources
            # are NOT covered by the slack zeros for this direction.
            ok = ((colc - dc >= 0) & (colc - dc < gw)).reshape(1, 1, lp)
            sl = sl * jnp.asarray(ok, dtype)
        pieces.append(sl * lane_ok)
    return pieces


def grouped_spatial_shift_chw(hw: ChwTensor, number: int) -> ChwTensor:
    """24-direction grouped spatial shift (``gshift_deblur1.py:470-503``)
    on the packed layout.  Every shift is a multiple of 4, so with pf in
    {1, 2, 4} the shifts are whole grid cells and phase-preserving: each
    direction's channel group is a lane-offset *slice* of one padded copy,
    and the groups partition the channel range, so the op is a channel
    CONCAT of shifted slices — the source is read once (the earlier
    mask-accumulate form read it 24 times).  Narrow channel slices are
    fine in this layout: channels live on sublanes, not lanes.  Columns
    use the slack-column zeros when the slack covers the shift distance
    and an explicit per-direction validity mask otherwise (slack < shift,
    e.g. lane-aligned widths where ``ws == gw`` would wrap into the
    adjacent row's real edge pixels); per-piece lane-validity masks
    restore the layout's zero-pad invariant."""
    pf, ws, gw, gh, padr = hw.pf, hw.ws, hw.gw, hw.gh, hw.padr
    assert 8 % pf == 0
    t, nch, lp = hw.data.shape
    cb = hw.cb
    s = 8 // pf  # max shift in cells
    slack = ws - gw
    pad_lanes = s * ws + s
    c = hw.c
    src = jnp.pad(hw.data, ((0, 0), (0, 0), (pad_lanes, pad_lanes)))
    colc = np.arange(lp, dtype=np.int64) % ws  # cell column per output lane
    dtype = hw.data.dtype
    lane_ok = _lane_ok(lp, ws, gw, gh, padr, dtype)

    blocks = []
    zpad = jnp.zeros((t, cb - c, lp), dtype)
    for p in range(pf * pf):
        blocks += _shift_pieces(src, pad_lanes, p * cb, number, pf, ws, gw,
                                slack, lp, t, dtype, colc, lane_ok)
        if cb != c:
            blocks.append(zpad)
    out = jnp.concatenate(blocks, axis=1)
    return ChwTensor(out, hw.h, hw.w, padr, pf, c)


def gsts_hw_chw(y: ChwTensor, add_c: int, number: int, *,
                reverse: bool) -> ChwTensor:
    """Fused ``extract_hw_chw`` + ``grouped_spatial_shift_chw``: builds the
    spatially-shifted extra-channel tensor directly from the temporally
    shifted ``y`` (one concat of shifted channel-group slices; no
    intermediate extract tensor)."""
    pf, ws, gw, gh, padr = y.pf, y.ws, y.gw, y.gh, y.padr
    assert 8 % pf == 0
    t, nch, lp = y.data.shape
    cb = y.cb
    s = 8 // pf
    slack = ws - gw
    pad_lanes = s * ws + s
    base = 0 if not reverse else y.c - add_c
    src = jnp.pad(y.data, ((0, 0), (0, 0), (pad_lanes, pad_lanes)))
    colc = np.arange(lp, dtype=np.int64) % ws
    dtype = y.data.dtype
    hcb = cpad16(add_c)
    lane_ok = _lane_ok(lp, ws, gw, gh, padr, dtype)

    blocks = []
    zpad = jnp.zeros((t, hcb - add_c, lp), dtype)
    for p in range(pf * pf):
        blocks += _shift_pieces(src, pad_lanes, p * cb + base, number, pf,
                                ws, gw, slack, lp, t, dtype, colc, lane_ok)
        if hcb != add_c:
            blocks.append(zpad)
    out = jnp.concatenate(blocks, axis=1)
    return ChwTensor(out, y.h, y.w, padr, pf, add_c)


# ---------------------------------------------------------------------------
# Fused shift-round Pallas kernel: one pass producing the temporally shifted
# tensor y (pure HBM->HBM DMA — the shift is a (frame, channel-block)
# permutation, so it runs at memory speed with zero compute) and the
# spatially shifted extra-channel tensor hw (24-direction select-assembly
# over lane-offset slices of a haloed VMEM slab read straight from x).
# Replaces the XLA ``temporal_shift_chw`` + ``gsts_hw_chw`` pair, whose
# skinny sublane-offset concat operands relayout poorly (measured 8.5 +
# 7.2 ms per round at the 720p L1 shape vs ~1 + ~1.5 ms floors).
# ---------------------------------------------------------------------------


def shift_round_eligible(x: ChwTensor, add_c: int) -> bool:
    """Whether the Pallas shift-round kernel supports this layout: the
    half-channel / extra-channel DMA row offsets must be 8-aligned
    (verified legal by tools/probe_dma_align.py; odd offsets are not), and
    the hw slab halo (8//pf cells) must fit inside the zero pad rows.

    ``SHIFTNET_NO_SHIFT_KERNEL=1`` force-disables the kernel (memory/perf
    A-B calibration only — tools/probe_envelope.py)."""
    import os
    if os.environ.get('SHIFTNET_NO_SHIFT_KERNEL'):
        return False
    if 8 % x.pf:
        return False
    s = 8 // x.pf
    half = x.c // 2
    return (x.padr >= s and half % 8 == 0 and add_c % 8 == 0
            and 0 < add_c <= half)


def _shift_round_kernel(x_hbm, y_hbm, hw_hbm, sbuf, obuf, zbuf, sem, ysem,
                        osem, zsem, *, th, ws, gw, gh, n, cb, add_c, acb,
                        pf, padr, t, s, reverse, patch, dirs, slack, dtype):
    """Grid (T, row-tiles).  Per frame: 2*pp (+pp channel-pad) HBM->HBM
    copies build y (started at the frame's first tile, waited at its last,
    overlapping the hw assembly); per tile: the hw source channel window is
    DMA'd from x with the temporal-shift addressing (boundary frames via
    ``pl.when`` branches — identical copy shapes keep the semaphore
    accounting branch-independent), then each direction group's piece is a
    static lane-offset slice of the slab and the groups are folded with
    sublane-iota selects (groups partition the channel range, so a select
    chain writes each output row exactly once — no sublane-offset stores)."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    total = t * n_tiles
    g = ti * n_tiles + hi
    slot = jax.lax.rem(g, 2)
    half = n // 2
    pp = pf * pf
    m = th * ws
    rows_in = th + 2 * s
    lp = x_hbm.shape[2]

    # --- y: HBM->HBM copies (start at hi==0; wait at hi==n_tiles-1) -------
    def y_starts(ti2):
        def plain(sm, c0s, c0d):
            for p in range(pp):
                pltpu.make_async_copy(
                    x_hbm.at[sm, pl.ds(p * cb + c0s, half)],
                    y_hbm.at[ti2, pl.ds(p * cb + c0d, half)], ysem).start()

        ti2 = jnp.asarray(ti2, jnp.int32)
        if not reverse:
            src = jnp.where(ti2 == 0, t - 1, ti2 - 1)
            is_edge = ti2 == 0
        else:
            src = jnp.where(ti2 == t - 1, 0, ti2 + 1)
            is_edge = ti2 == t - 1

        def moved():
            if not reverse:
                plain(src, half, 0)   # moved half lands FIRST (torch roll)
                plain(ti2, 0, half)
            else:
                plain(ti2, half, 0)
                plain(src, 0, half)

        if patch:
            @pl.when(is_edge)
            def _():
                plain(ti2, 0, 0)      # boundary frame: unshifted input
                plain(ti2, half, half)

            @pl.when(~is_edge)
            def _():
                moved()
        else:
            moved()
        if cb != n:
            for p in range(pp):
                pltpu.make_async_copy(
                    x_hbm.at[ti2, pl.ds(p * cb + n, cb - n)],
                    y_hbm.at[ti2, pl.ds(p * cb + n, cb - n)], ysem).start()

    @pl.when(hi == 0)
    def _():
        y_starts(ti)

    # --- hw source slab: 2-slot lookahead DMA from x -----------------------
    # hw[t] = gsts(y[t][base : base+add_c]); in x terms that channel window
    # is rows [c0_main) of the PREV/NEXT frame (or [c0_edge) of the frame
    # itself at a patched boundary): fwd y[t][:add_c] = x[t-1][half:half+
    # add_c], rev y[t][n-add_c:] = x[t+1][n-add_c-half : half].
    if not reverse:
        c0_main, c0_edge = half, 0
    else:
        c0_main, c0_edge = n - add_c - half, n - add_c

    def slab_addr(ti2):
        ti2 = jnp.asarray(ti2, jnp.int32)  # keep predicates traced even for
        # the static program-0 lookahead (a Python-bool ``~edge`` is -2,
        # which pl.when treats as TRUE — both branches would issue copies)
        if not reverse:
            src = jnp.where(ti2 == 0, (0 if patch else t - 1), ti2 - 1)
            edge = ti2 == 0
        else:
            src = jnp.where(ti2 == t - 1, (t - 1 if patch else 0), ti2 + 1)
            edge = ti2 == t - 1
        return src, edge

    def start_slab(gg, sl):
        ti2 = gg // n_tiles
        lane0 = (jax.lax.rem(gg, n_tiles) * th + padr - s) * ws
        src, edge = slab_addr(ti2)

        def issue(sm, c0):
            for p in range(pp):
                pltpu.make_async_copy(
                    x_hbm.at[sm, pl.ds(p * cb + c0, add_c),
                             pl.ds(lane0, rows_in * ws)],
                    sbuf.at[sl, pl.ds(p * acb, add_c),
                            pl.ds(LANE, rows_in * ws)],
                    sem.at[sl]).start()

        if patch:
            @pl.when(edge)
            def _():
                issue(ti2, c0_edge)

            @pl.when(~edge)
            def _():
                issue(src, c0_main)
        else:
            issue(src, c0_main)

    @pl.when(g == 0)
    def _():
        sbuf[...] = jnp.zeros_like(sbuf)
        obuf[...] = jnp.zeros_like(obuf)
        zbuf[...] = jnp.zeros_like(zbuf)
        start_slab(0, 0)

    @pl.when(g + 1 < total)
    def _():
        start_slab(g + 1, jax.lax.rem(g + 1, 2))

    for _ in range(pp):   # shape-only waits (one per phase copy)
        pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(0, add_c), pl.ds(0, rows_in * ws)],
            sbuf.at[slot, pl.ds(0, add_c), pl.ds(LANE, rows_in * ws)],
            sem.at[slot]).wait()

    # --- 24-direction assembly, one phase at a time (fori_loop keeps a
    # single phase of unrolled select temporaries live) --------------------
    colm = _col_index(m, ws)
    ri = jax.lax.broadcasted_iota(jnp.int32, (add_c, 1), 0)
    dycs = sorted({d[2] for d in dirs})

    def phase_body(p, carry):
        row0 = pl.multiple_of(p * acb, 16)
        # one haloed window load per distinct row shift; the +-dxc lane
        # nudge is a STATIC slice of the 128-lead window (dynamic lane
        # offsets must be 128-multiples; static nudges are free).
        wins = {dyc: sbuf[pl.ds(slot, 1), pl.ds(row0, add_c),
                          pl.ds((s - dyc) * ws, m + 2 * LANE)]
                for dyc in dycs}
        acc = None
        for c0, csz, dyc, dxc in dirs:
            piece = jax.lax.slice(
                wins[dyc], (0, 0, LANE - dxc),
                (1, add_c, LANE - dxc + m))[0]
            if dxc != 0 and abs(dxc) > slack:
                # out col c reads src col c - dxc; wraps past the slack
                # zeros into the adjacent row's real pixels — mask them.
                ok = (colm - dxc >= 0) & (colm - dxc < gw)
                piece = jnp.where(ok, piece, jnp.zeros_like(piece))
            if acc is None:
                acc = piece
            else:
                mask = (ri >= c0) & (ri < c0 + csz)
                acc = jnp.where(mask, piece, acc)
        if slack:
            # restore the layout's zero-slack invariant (dxc < 0 slices
            # pull the next row's lead pixels into the slack columns).
            acc = jnp.where(colm < gw, acc, jnp.zeros_like(acc))
        obuf[pl.ds(row0, add_c), :] = acc
        return carry

    jax.lax.fori_loop(0, pp, phase_body, 0)
    _emit_tile(hw_hbm, obuf, zbuf, osem, zsem, ti, hi, n_tiles, th, ws,
               padr, gh)

    @pl.when(hi == n_tiles - 1)
    def _():
        n_y = 2 * pp + (pp if cb != n else 0)
        for _ in range(2 * pp):
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, half)],
                y_hbm.at[0, pl.ds(0, half)], ysem).wait()
        for _ in range(n_y - 2 * pp):
            pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(0, cb - n)],
                y_hbm.at[0, pl.ds(0, cb - n)], ysem).wait()


def _shift_round_budget(th, ws, pf, add_c, acb, s, padr, esz):
    """Live-VMEM estimate per program: slab slots + obuf/zbuf + the per-dyc
    windows and the unrolled slice/select temporaries of ONE phase."""
    pp = pf * pf
    m = th * ws
    rows_in = th + 2 * s
    return (2 * pp * acb * (2 * LANE + rows_in * ws) * esz
            + pp * acb * m * esz                      # obuf
            + pp * acb * (padr * ws + TAIL) * esz     # zbuf
            + 5 * add_c * (m + 2 * LANE) * esz        # dyc windows
            + 50 * add_c * m * esz                    # slice+select temps
            + m * 4 * 2)                              # col iota


def shift_round_chw(x: ChwTensor, add_c: int, number: int, *,
                    reverse: bool, boundary_patch: bool,
                    interpret: bool | None = None
                    ) -> tuple[ChwTensor, ChwTensor]:
    """Fused shift round: returns (temporal-shift y, spatially shifted hw),
    equal to ``temporal_shift_chw`` + ``gsts_hw_chw`` (reference
    ``gshift_deblur1.py:470-528``).  Falls back to the XLA pair on layouts
    the kernel's DMA alignment rules exclude (``shift_round_eligible``)."""
    if interpret is None:
        interpret = _interpret()
    if not shift_round_eligible(x, add_c):
        y = temporal_shift_chw(x, reverse=reverse,
                               boundary_patch=boundary_patch)
        return y, gsts_hw_chw(y, add_c, number, reverse=reverse)
    assert add_c == 8 * number, (add_c, number)
    t, nch, lp = x.data.shape
    pf, n, cb, ws, gw, gh, padr = (x.pf, x.c, x.cb, x.ws, x.gw, x.gh,
                                   x.padr)
    dtype = x.data.dtype
    pp = pf * pf
    acb = cpad16(add_c)
    s = 8 // pf
    slack = ws - gw
    dirs = tuple((c0, csz, dy // pf, dx // pf)
                 for c0, csz, dy, dx in shift_dir_table(number) if csz)

    import os
    esz = jnp.dtype(dtype).itemsize
    cap_mb = float(os.environ.get('SHIFTNET_SHIFT_CAP_MB',
                                  '13' if esz == 2 else '4'))
    from shiftnet_tpu.ops.chw import cap_scale
    cap = int(cap_mb * cap_scale() * 1024 * 1024)
    if ws < 256:
        cap = cap * ws // 256
    th = _pick_th(gh, lambda t2: _shift_round_budget(t2, ws, pf, add_c, acb,
                                                     s, padr, esz), cap)
    th = int(os.environ.get('SHIFTNET_SHIFT_TH', th))  # calibration only
    n_tiles = gh // th

    y, hw = pl.pallas_call(
        functools.partial(_shift_round_kernel, th=th, ws=ws, gw=gw, gh=gh,
                          n=n, cb=cb, add_c=add_c, acb=acb, pf=pf,
                          padr=padr, t=t, s=s, reverse=reverse,
                          patch=boundary_patch, dirs=dirs, slack=slack,
                          dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((t, nch, lp), dtype),
                   jax.ShapeDtypeStruct((t, pp * acb, lp), dtype)],
        scratch_shapes=[
            pltpu.VMEM((2, pp * acb, 2 * LANE + (th + 2 * s) * ws), dtype),
            pltpu.VMEM((pp * acb, th * ws), dtype),
            pltpu.VMEM((pp * acb, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=_mosaic_params(),
    )(x.data)
    return (ChwTensor(y, x.h, x.w, padr, pf, n),
            ChwTensor(hw, x.h, x.w, padr, pf, add_c))


# ---------------------------------------------------------------------------
# Weight preparation (host side).
# ---------------------------------------------------------------------------


def _dense_rep(rep5, rep3, n, groups, dtype, cb):
    """Merged RepConv weight: grouped 5x5 + grouped 3x3 + identity as ONE
    (25, cb, n) block-diagonal dense tap stack (f32 merge, single
    bf16 cast).  jnp throughout (params may be tracers)."""
    f32 = jnp.float32
    cing = n // groups
    per = n // groups
    w = jnp.zeros((25, cb, n), f32)
    r5 = rep5.astype(f32).reshape(25, cing, n)
    r3 = rep3.astype(f32).reshape(9, cing, n)
    # scatter the grouped blocks via a (cb, n) one-hot block-diagonal mask
    # batched over taps: w[tap, ci, co] = r_expanded masked to the diagonal
    blockmask = jnp.zeros((cb, n), f32)
    for g in range(groups):
        blockmask = blockmask.at[g * cing:(g + 1) * cing,
                                 g * per:(g + 1) * per].set(1.0)
    # r5 rows are per-group input channels; tile them to full cb rows
    reps = jnp.tile(r5, (1, groups, 1))[:, :cb] if cing * groups == n \
        else r5
    w = w + jnp.pad(reps, ((0, 0), (0, cb - cing * groups), (0, 0))) \
        * blockmask
    rep3f = jnp.tile(r3, (1, groups, 1))[:, :cb] if cing * groups == n \
        else r3
    rep3f = jnp.pad(rep3f, ((0, 0), (0, cb - cing * groups), (0, 0))) \
        * blockmask
    for i in range(9):
        dy, dx = divmod(i, 3)
        tap = (dy + 1) * 5 + (dx + 1)
        w = w.at[tap].add(rep3f[i])
    w = w.at[12, :n].add(jnp.eye(n, dtype=f32))
    return w.reshape(25 * cb, n).T.astype(dtype)  # (n, 25*cb)


def prep_naf_weights(params: dict[str, Any], n: int, add_c: int,
                     groups: int, dtype, cb: int,
                     hcb: int) -> dict[str, jax.Array]:
    """Precompute kernel-side weight matrices from the declared NAF param
    tree (``naf_params_from_tree``).  ``cb``/``hcb`` are
    the tensor block strides (== channel counts for pf=1 layouts)."""
    f32 = jnp.float32
    cin = n + add_c
    w0 = params['w0'].astype(f32)                     # (cin, 2n)
    g = params['ln_w'].astype(f32)
    b = params['ln_b'].astype(f32)
    wg = (w0 * g[:, None]).T                          # (2n, cin)
    c1 = (w0.T @ g)                                   # (2n,)
    c2 = (w0.T @ b)                                   # (2n,)

    half = n // 2

    def chunk_rows(k):
        return list(range(k * half, (k + 1) * half)) + \
            list(range(n + k * half, n + (k + 1) * half))

    wa, wb, c1c, c2c, dw0c = [], [], [], [], []
    dw0 = params['dw0'].reshape(9, 2 * n).astype(f32)
    nr = n + 8  # +1 ones-row (LN channel-sum riding the expand matmul,
    # free: MXU pads M to 128 anyway), padded to a sublane multiple
    for k in range(2):
        rows = jnp.asarray(chunk_rows(k))
        m = wg[rows]                                  # (n, cin)
        ya = jnp.zeros((nr, cb), f32).at[:n, :n].set(m[:, :n])
        ya = ya.at[n, :].set(1.0)  # s1 row (channel pad rows are zero)
        wa.append(ya)
        if add_c:
            yb = jnp.zeros((nr, hcb), f32).at[:n, :add_c].set(m[:, n:])
            yb = yb.at[n, :].set(1.0)
            wb.append(yb)
        c1c.append(c1[rows])
        c2c.append(c2[rows])
        dw0c.append(dw0[:, rows])                     # (9, n)
    out = {
        'wa': jnp.stack(wa).astype(dtype),            # (2, nr, cb)
        'c1': jnp.stack(c1c).reshape(2, n, 1).astype(f32),
        'c2': jnp.stack(c2c).reshape(2, n, 1).astype(f32),
        'dw0': jnp.stack([m.T for m in dw0c]).astype(dtype),  # (2, n, 9)
        'rep': _dense_rep(params['rep5'], params['rep3'], n, groups, dtype,
                          cb),
        'w4': params['w4'].astype(f32).T.astype(dtype),   # (2n, n) lhs
        'w7': jnp.zeros((n, cb), f32).at[:, :n].set(
            params['w7'].astype(f32).T).astype(dtype),    # (n, cb) lhs
        'beta': params['beta'].reshape(n, 1).astype(f32),
        'b7': params.get('b7', jnp.zeros((n,))).reshape(n, 1).astype(f32),
    }
    if add_c:
        out['wb'] = jnp.stack(wb).astype(dtype)       # (2, n, hcb)
        out['dwc'] = jnp.zeros((hcb, 9), f32).at[:add_c].set(
            params['dwc'].reshape(9, add_c).T).astype(dtype)
    return out



# ---------------------------------------------------------------------------
# XLA-side depthwise 3x3 (CAB2 conv1) on the packed layout.
# ---------------------------------------------------------------------------


def dw3x3_chw(x: ChwTensor, w: jax.Array) -> ChwTensor:
    """Depthwise 3x3 conv (no bias) on a packed ChwTensor; ``w`` is the
    (3, 3, C) per-channel kernel (reference CAB2 ``conv1``,
    ``gshift_deblur1.py:216-218``).  Phase-crossing taps are channel-block
    slices at cell-offset lanes — a dense XLA shift-add fusion, like the
    grouped spatial shift."""
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
    colc = np.arange(lp, dtype=np.int64) % ws  # cell column per output lane

    outs = []
    for p in range(pp):
        acc = None
        for i, (blk, cdr, cdc) in enumerate(taps[p]):
            off = pad_lanes + cdr * ws + cdc
            sl = jax.lax.slice(src, (0, blk, 0, off),
                               (t, blk + 1, c, off + lp))
            term = sl.astype(jnp.float32) * wt[i].reshape(1, 1, c, 1)
            if abs(cdc) > slack:
                # out col cc reads source col cc + cdc: without slack the
                # edge tap wraps into the neighboring row — mask it.
                ok = ((colc + cdc >= 0) & (colc + cdc < gw)).reshape(
                    1, 1, 1, lp)
                term = term * jnp.asarray(ok, jnp.float32)
            acc = term if acc is None else acc + term
        outs.append(jnp.pad(acc, ((0, 0), (0, 0), (0, cb - c), (0, 0))))
    out = jnp.concatenate(outs, axis=1).reshape(t, nch, lp)

    lane_ok = np.zeros((1, lp), np.float32)
    body = np.zeros(((gh + 2 * padr), ws), np.float32)
    body[padr: padr + gh, :gw] = 1.0
    lane_ok[0, : (gh + 2 * padr) * ws] = body.reshape(-1)
    out = out * jnp.asarray(lane_ok, jnp.float32)
    return ChwTensor(out.astype(x.data.dtype), x.h, x.w, padr, pf, c)


# ---------------------------------------------------------------------------
# Kernels.  All three read/write standard padded ChwTensors (each re-reads
# its own halo; no staged overlapping blocks — keeps VMEM small).
# ---------------------------------------------------------------------------


def _naf_gate_kernel(y_hbm, hw_hbm, wa, wb, c1, c2, dw0, dwc, g_hbm,
                     gsums_ref, ybuf, hwbuf, hw2buf, ebuf, obuf, zbuf,
                     sem, sem2, osem, zsem, *, th, ws, gw, gh,
                     n, cb, hcb, add_c, pf, padr, masked, eps, dtype):
    """LN-folded 1x1 expand -> RepConv2 (dw 3x3 + id) -> SimpleGate.

    The SimpleGate pairs channel i with i+n, so chunk k computes expand
    rows [k*n/2,(k+1)*n/2) u [n+k*n/2, ...); the chunk axis is the
    innermost GRID axis (the y slab persists in scratch across both chunk
    programs) and the expand runs as a ``fori_loop`` over phases — both
    keep Mosaic's no-reuse stack allocation to ONE phase/chunk of
    temporaries, which is what buys large row tiles (VMEM is the binding
    constraint at the 720p L1 scale).  The LN channel sum rides the expand
    matmul as an appended ones-row (``prep_naf_weights``): M pads to 128
    on the MXU anyway, so s1 is free; only the square-sum s2 needs a VPU
    pass.  For CAB2, the depthwise 3x3 over the shifted channels
    (reference ``conv1``) runs IN-KERNEL on the raw hw slab (one extra
    halo cell) instead of as a separate XLA pass — that pass was ~40% of
    the v1 CAB2 gate time at the 720p L1 scale."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    kk = pl.program_id(2)
    n_tiles = pl.num_programs(1)
    tiles_total = pl.num_programs(0) * n_tiles
    tj = ti * n_tiles + hi
    slot = jax.lax.rem(tj, 2)
    f32 = jnp.float32
    pp = pf * pf
    half = n // 2
    rows_e = th + 2
    m_e = rows_e * ws
    m_h = (th + 4) * ws       # raw hw slab: +1 cell halo for the dw 3x3
    m_g = th * ws
    cin = n + add_c

    def start_reads(gg, sl):
        ti2 = gg // n_tiles
        lane0 = (jax.lax.rem(gg, n_tiles) * th + padr - 1) * ws
        pltpu.make_async_copy(
            y_hbm.at[ti2, :, pl.ds(lane0, m_e)],
            ybuf.at[sl, :, pl.ds(LANE, m_e)], sem.at[sl]).start()
        if add_c:
            lane0h = (jax.lax.rem(gg, n_tiles) * th + padr - 2) * ws
            pltpu.make_async_copy(
                hw_hbm.at[ti2, :, pl.ds(lane0h, m_h)],
                hwbuf.at[sl, :, pl.ds(LANE, m_h)], sem2.at[sl]).start()

    @pl.when(kk == 0)
    def _():
        @pl.when(tj == 0)
        def _():
            ybuf[...] = jnp.zeros_like(ybuf)
            hwbuf[...] = jnp.zeros_like(hwbuf)
            ebuf[:, :LANE] = jnp.zeros((ebuf.shape[0], LANE), dtype)
            ebuf[:, LANE + m_e:] = jnp.zeros((ebuf.shape[0], LANE), dtype)
            zbuf[...] = jnp.zeros_like(zbuf)
            obuf[...] = jnp.zeros_like(obuf)
            start_reads(0, 0)

        @pl.when(tj + 1 < tiles_total)
        def _():
            start_reads(tj + 1, jax.lax.rem(tj + 1, 2))

        # obuf slot reuse: tile tj-2's deferred write must have drained
        @pl.when(tj >= 2)
        def _():
            pltpu.make_async_copy(
                obuf.at[slot], g_hbm.at[0, :, pl.ds(0, m_g)],
                osem.at[slot]).wait()

        pltpu.make_async_copy(
            y_hbm.at[0, :, pl.ds(0, m_e)],
            ybuf.at[slot, :, pl.ds(LANE, m_e)], sem.at[slot]).wait()
        if add_c:
            pltpu.make_async_copy(
                hw_hbm.at[0, :, pl.ds(0, m_h)],
                hwbuf.at[slot, :, pl.ds(LANE, m_h)], sem2.at[slot]).wait()
            # depthwise 3x3 over the shifted channels (reference conv1),
            # computed once per tile (kk==0) into hw2buf; hw2 row j (the
            # expand's row j, cell hi*th-1+j) reads hw slab rows j..j+2.
            colh = _col_index(m_e, ws)
            for p in range(pp):
                acc = None
                for i, (blk, cdr, cdc) in enumerate(_TAPS3[pf][p]):
                    piece = hwbuf[slot, pl.ds(blk * hcb, hcb),
                                  pl.ds(LANE + (1 + cdr) * ws + cdc, m_e)]
                    term = piece.astype(jnp.float32) \
                        * dwc[:, i].reshape(hcb, 1).astype(jnp.float32)
                    if masked and cdc != 0:
                        okc = (colh + cdc >= 0) & (colh + cdc < gw)
                        term = jnp.where(okc, term, jnp.zeros_like(term))
                    acc = term if acc is None else acc + term
                hw2buf[pl.ds(p * hcb, hcb), pl.ds(LANE, m_e)] = \
                    acc.astype(dtype)

    col = _col_index(m_e, ws)
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, m_e), 1) // ws
    cell_e = hi * th - 1 + ri
    e_ok = (cell_e >= 0) & (cell_e < gh)
    if not masked:
        e_ok = e_ok & col_slack_ok(m_e, ws, gw)
    taps3 = _TAPS3[pf]
    wav = wa[0]                        # (nr, cb) block for this chunk
    wbv = wb[0] if add_c else None
    c1v = c1[0]                        # (n, 1)
    c2v = c2[0]

    def expand_body(p, carry):
        ypb = ybuf[slot, pl.ds(pl.multiple_of(p * cb, 16), cb),
                   pl.ds(LANE, m_e)]
        e = jax.lax.dot_general(
            wav, ypb, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        s2 = jnp.sum(jnp.square(ypb.astype(f32)), axis=0, keepdims=True)
        if add_c:
            hpb = hw2buf[pl.ds(pl.multiple_of(p * hcb, 16), hcb),
                         pl.ds(LANE, m_e)]
            e = e + jax.lax.dot_general(
                wbv, hpb, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            s2 = s2 + jnp.sum(jnp.square(hpb.astype(f32)), axis=0,
                              keepdims=True)
        s1 = jax.lax.slice(e, (n, 0), (n + 1, m_e))
        ev = jax.lax.slice(e, (0, 0), (n, m_e))
        mu = s1 / cin
        var = s2 / cin - mu * mu
        inv = jax.lax.rsqrt(var + eps)
        ev = inv * ev - (inv * mu) * c1v + c2v
        ev = jnp.where(e_ok, ev, jnp.zeros_like(ev)).astype(dtype)
        ebuf[pl.ds(pl.multiple_of(p * n, 16), n), pl.ds(LANE, m_e)] = ev
        return carry

    jax.lax.fori_loop(0, pp, expand_body, 0)

    ev_all = ebuf[...]
    gs = None
    for p in range(pp):
        center = jax.lax.slice(
            ev_all, (p * n, LANE + ws), ((p + 1) * n, LANE + ws + m_g))
        d = center.astype(f32)
        for i, (blk, cdr, cdc) in enumerate(taps3[p]):
            piece = jax.lax.slice(
                ev_all, (blk * n, LANE + ws + cdr * ws + cdc),
                ((blk + 1) * n, LANE + ws + cdr * ws + cdc + m_g))
            if masked and cdc != 0:
                ok = (col[:, :m_g] + cdc >= 0) & \
                    (col[:, :m_g] + cdc < gw)
                piece = jnp.where(ok, piece, jnp.zeros_like(piece))
            d = d + piece.astype(f32) * jax.lax.slice(
                dw0[0], (0, i), (n, i + 1)).astype(f32)
        gval = (jax.lax.slice(d, (0, 0), (half, m_g))
                * jax.lax.slice(d, (half, 0), (n, m_g)))
        if not masked:
            gval = jnp.where(col_slack_ok(m_g, ws, gw), gval,
                             jnp.zeros_like(gval))
        gb = gval.astype(dtype)

        @pl.when(kk == 0)
        def _(gb=gb, p=p):
            obuf[slot, pl.ds(p * cb, half), :] = gb

        @pl.when(kk == 1)
        def _(gb=gb, p=p):
            obuf[slot, pl.ds(p * cb + half, half), :] = gb

        part = jnp.sum(gval.astype(f32), axis=1)
        gs = part if gs is None else gs + part

    npad = ((n + LANE - 1) // LANE) * LANE
    vec0 = jnp.pad(gs.reshape(1, half), ((0, 0), (0, npad - half)))
    vec1 = jnp.pad(gs.reshape(1, half), ((0, 0), (half, npad - n)))

    @pl.when(kk == 0)
    def _():
        gsums_ref[0, 0] = jnp.broadcast_to(vec0, (8, npad))

    @pl.when(kk == 1)
    def _():
        gsums_ref[0, 0] += jnp.broadcast_to(vec1, (8, npad))

    @pl.when(kk == 1)
    def _():
        # deferred tile write: start now, wait two tiles later (slot reuse)
        pltpu.make_async_copy(
            obuf.at[slot],
            g_hbm.at[ti, :, pl.ds((hi * th + padr) * ws, m_g)],
            osem.at[slot]).start()

        @pl.when(hi == 0)
        def _():
            zp = pltpu.make_async_copy(
                zbuf.at[:, pl.ds(0, padr * ws)],
                g_hbm.at[ti, :, pl.ds(0, padr * ws)], zsem)
            zp.start()
            zp.wait()

        @pl.when(hi == n_tiles - 1)
        def _():
            zp = pltpu.make_async_copy(
                zbuf,
                g_hbm.at[ti, :, pl.ds((padr + gh) * ws, zbuf.shape[1])],
                zsem)
            zp.start()
            zp.wait()

        @pl.when(tj == tiles_total - 1)
        def _():
            pltpu.make_async_copy(
                obuf.at[slot], g_hbm.at[0, :, pl.ds(0, m_g)],
                osem.at[slot]).wait()

        @pl.when((tj == tiles_total - 1) & (tiles_total > 1))
        def _():
            pltpu.make_async_copy(
                obuf.at[1 - slot], g_hbm.at[0, :, pl.ds(0, m_g)],
                osem.at[1 - slot]).wait()


_TAPS3 = {pf: [phase_taps(pf, pf, 3, 1, 1)[(a, b)] for a in range(pf)
               for b in range(pf)] for pf in (1, 2, 4)}
_TAPS5 = {pf: [phase_taps(pf, pf, 5, 1, 2)[(a, b)] for a in range(pf)
               for b in range(pf)] for pf in (1, 2, 4)}


def _naf_rep_kernel(phr_ref, offr_ref, g_hbm, cag, repw, w4, s_ref,
                    sums_ref, gbuf, pbuf, sem, *, th, ws, gw, gh, n, cb,
                    pf, padr, rg, masked, has_cag, dtype):
    """[mid-CA scale] -> merged RepConv (25-tap block-diag dense, per-dy
    accumulated matmuls) -> 1x1 expand -> SimpleGate2 (+ CA sums).

    Grid is (T, row-tiles, row-phases): the haloed g slab is DMA'd once per
    tile (scratch persists across the consecutive phase programs); row-tap
    tables arrive via scalar prefetch (their lane offsets are ws-multiples,
    which Mosaic accepts as dynamic 128-aligned starts), while column
    phases/taps stay statically unrolled (their +-cdc lane nudge is applied
    as a static slice of an aligned window)."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    a = pl.program_id(2)
    n_tiles = pl.num_programs(1)
    tiles_total = pl.num_programs(0) * n_tiles
    tj = ti * n_tiles + hi
    tslot = jax.lax.rem(tj, 2)
    f32 = jnp.float32
    m = th * ws
    rows_in = th + 2 * rg

    def start_slab(tt, sl):
        ti2 = tt // n_tiles
        lane0 = (jax.lax.rem(tt, n_tiles) * th + padr - rg) * ws
        pltpu.make_async_copy(
            g_hbm.at[ti2, :, pl.ds(lane0, rows_in * ws)],
            gbuf.at[sl, :, pl.ds(LANE, rows_in * ws)], sem.at[sl]).start()

    @pl.when(a == 0)
    def _():
        @pl.when(tj == 0)
        def _():
            gbuf[...] = jnp.zeros_like(gbuf)
            start_slab(0, 0)

        @pl.when(tj + 1 < tiles_total)
        def _():
            start_slab(tj + 1, jax.lax.rem(tj + 1, 2))
        pltpu.make_async_copy(
            g_hbm.at[0, :, pl.ds(0, rows_in * ws)],
            gbuf.at[tslot, :, pl.ds(LANE, rows_in * ws)],
            sem.at[tslot]).wait()

    repv = repw[...]
    w4v = w4[...]
    col = _col_index(m, ws) if masked else None

    for b in range(pf):
        r = None
        for dy in range(5):
            for dx in range(5):
                ccol, phc = divmod(b + dx - 2, pf)
                rowst = pl.multiple_of(
                    (phr_ref[a, dy] * pf + phc) * cb, 16)
                lanest = pl.multiple_of(rg * ws + offr_ref[a, dy], LANE)
                window = gbuf[pl.ds(tslot, 1), pl.ds(rowst, cb),
                              pl.ds(lanest, m + 2 * LANE)]
                piece = jax.lax.slice(window, (0, 0, LANE + ccol),
                                      (1, cb, LANE + ccol + m))[0]
                if has_cag:  # mid-CA scale (denoise); identity for deblur
                    scl = cag[0, pl.ds(rowst, cb)]
                    piece = piece * scl.astype(dtype)
                if masked and ccol != 0:
                    ok = (col + ccol >= 0) & (col + ccol < gw)
                    piece = jnp.where(ok, piece, jnp.zeros_like(piece))
                pbuf[pl.ds(dx * cb, cb), pl.ds(0, m)] = piece
            part = jax.lax.dot_general(
                repv[:, dy * 5 * cb:(dy + 1) * 5 * cb],
                pbuf[:, pl.ds(0, m)],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            r = part if r is None else r + part
        rb = r.astype(dtype)
        e2 = jax.lax.dot_general(
            w4v, rb, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        s = (e2[:n].astype(dtype) * jax.nn.sigmoid(e2[n:]).astype(dtype))
        if not masked:
            s = jnp.where(col_slack_ok(m, ws, gw), s, jnp.zeros_like(s))
        s_ref[0, pl.ds(b * cb, n)] = s
        if cb != n:
            s_ref[0, pl.ds(b * cb + n, cb - n)] = jnp.zeros((cb - n, m),
                                                            dtype)
        pad = ((n + LANE - 1) // LANE) * LANE
        vec = jnp.pad(jnp.sum(s.astype(f32), axis=1).reshape(1, n),
                      ((0, 0), (0, pad - n)))
        vec = jnp.broadcast_to(vec, (8, pad))

        @pl.when((a == 0) & (b == 0))
        def _():
            sums_ref[0, 0] = vec

        @pl.when((a > 0) | (b > 0))
        def _():
            sums_ref[0, 0] += vec


def _rep_tables(pf, ws):
    """Row-phase tap tables for the 5x5 RepConv: input row phase and
    ws-multiple lane offset per (out row phase a, dy)."""
    phr = np.zeros((pf, 5), np.int32)
    off = np.zeros((pf, 5), np.int32)
    for a in range(pf):
        for dy in range(5):
            cdr, ph = divmod(a + dy - 2, pf)
            phr[a, dy] = ph
            off[a, dy] = cdr * ws
    return jnp.asarray(phr), jnp.asarray(off)


def _naf_back_kernel(y_hbm, s_ref, ca, w7, beta, b7, out_hbm, ibuf, obuf,
                     zbuf, sem, osem, zsem, *, th, ws, gw, gh, n, cb, pf,
                     padr, dtype):
    """out = shortcut + beta * (w7 @ (s * ca) + b7), pipelined: 2-slot
    lookahead reads of the shortcut, deferred 2-slot tile writes.  The
    projection is column-masked on slack layouts: with ``b7 != 0``
    (denoise) the bias would otherwise land in the slack columns and break
    the layout's zero-pad invariant (the next round's dw taps read those
    lanes as conv zero-padding)."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    total = pl.num_programs(0) * n_tiles
    g = ti * n_tiles + hi
    slot = jax.lax.rem(g, 2)
    f32 = jnp.float32
    pp = pf * pf
    m = th * ws

    def start_read(gg, sl):
        ti2 = gg // n_tiles
        lane0 = (jax.lax.rem(gg, n_tiles) * th + padr) * ws
        pltpu.make_async_copy(
            y_hbm.at[ti2, :, pl.ds(lane0, m)], ibuf.at[sl],
            sem.at[sl]).start()

    @pl.when(g == 0)
    def _():
        zbuf[...] = jnp.zeros_like(zbuf)
        start_read(0, 0)

    @pl.when(g + 1 < total)
    def _():
        start_read(g + 1, jax.lax.rem(g + 1, 2))

    @pl.when(g >= 2)
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[0, :, pl.ds(0, m)],
            osem.at[slot]).wait()

    scaled = s_ref[0] * ca[0].astype(dtype)
    pltpu.make_async_copy(
        y_hbm.at[0, :, pl.ds(0, m)], ibuf.at[slot], sem.at[slot]).wait()
    iv = ibuf[slot]

    for p in range(pp):
        sp = jax.lax.slice(scaled, (p * cb, 0), ((p + 1) * cb, m))
        y7 = jax.lax.dot_general(
            w7[...], sp, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        y7 = (y7 + b7[...].astype(f32)) * beta[...].astype(f32)
        if ws != gw:
            y7 = jnp.where(col_slack_ok(m, ws, gw), y7, jnp.zeros_like(y7))
        short = jax.lax.slice(iv, (p * cb, 0), (p * cb + n, m))
        obuf[slot, pl.ds(p * cb, n), :] = (short.astype(f32)
                                           + y7).astype(dtype)
        if cb != n:
            obuf[slot, pl.ds(p * cb + n, cb - n), :] = jnp.zeros(
                (cb - n, m), dtype)

    pltpu.make_async_copy(
        obuf.at[slot], out_hbm.at[ti, :, pl.ds((hi * th + padr) * ws, m)],
        osem.at[slot]).start()

    @pl.when(hi == 0)
    def _():
        zp = pltpu.make_async_copy(
            zbuf.at[:, pl.ds(0, padr * ws)],
            out_hbm.at[ti, :, pl.ds(0, padr * ws)], zsem)
        zp.start()
        zp.wait()

    @pl.when(hi == n_tiles - 1)
    def _():
        zp = pltpu.make_async_copy(
            zbuf, out_hbm.at[ti, :, pl.ds((padr + gh) * ws, zbuf.shape[1])],
            zsem)
        zp.start()
        zp.wait()

    @pl.when(g == total - 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[0, :, pl.ds(0, m)],
            osem.at[slot]).wait()

    @pl.when((g == total - 1) & (total > 1))
    def _():
        pltpu.make_async_copy(
            obuf.at[1 - slot], out_hbm.at[0, :, pl.ds(0, m)],
            osem.at[1 - slot]).wait()


# ---------------------------------------------------------------------------
# Host wrapper + shift-block orchestration.
# ---------------------------------------------------------------------------


def _gate_budget(th, ws, pf, n, cb, hcb, add_c, esz):
    """Live-VMEM estimate for one gate program (v2: chunk axis on the
    grid, fori-loop expand -> one phase/chunk of stack temporaries)."""
    pp = pf * pf
    m_e = (th + 2) * ws
    m_g = th * ws
    need = (
        2 * pp * cb * (2 * LANE + m_e) * esz +           # ybuf (2 slots)
        pp * n * (2 * LANE + m_e) * esz +                # ebuf
        2 * pp * cb * m_g * esz +                        # obuf (2 slots)
        3 * (n + 8) * m_e * 4 +                          # expand f32 temps
        6 * n * m_g * 4 +                                # dw value-acc temps
        m_e * 4 * 4)
    if add_c:
        need += (2 * pp * hcb * (2 * LANE + (th + 4) * ws) * esz  # hwbuf
                 + pp * hcb * (2 * LANE + m_e) * esz              # hw2buf
                 + 4 * hcb * m_e * 4)                    # dw value-acc temps
    return need


def _rep_budget(th, ws, pf, n, cb, rg, esz):
    """Live-VMEM estimate for one rep program (phases already on the
    grid)."""
    nch = pf * pf * cb
    m = th * ws
    rows_in = th + 2 * rg
    need = (
        2 * nch * (2 * LANE + rows_in * ws) * esz +      # gbuf (2 slots)
        5 * cb * m * esz +                               # pbuf
        2 * n * m * 4 +                                  # rep acc f32
        2 * n * m * 4 +                                  # e2/s f32
        pf * cb * m * esz)                               # s out block
    return need


def _pick_th(gh, budget_fn, cap):
    return next((t2 for t2 in (16, 12, 8, 6, 4, 3, 2, 1)
                 if gh % t2 == 0 and budget_fn(t2) < cap),
                next(t2 for t2 in (1, 2, 3) if gh % t2 == 0))


def _naf_mlp(sums, n_px, du1, du2, dtype):
    mean = (sums / n_px).astype(dtype)
    z = jax.lax.dot_general(mean, du1.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = jnp.maximum(z.astype(dtype), 0)
    z = jax.lax.dot_general(z, du2.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(z.astype(dtype))


def naf_cab_chw(y: ChwTensor, hw: ChwTensor | None,
                params: dict[str, Any], *, groups: int,
                mid_ca: bool = False, use_last_bias: bool = False,
                eps: float = 1e-6, stage: str = 'full',
                interpret: bool | None = None) -> ChwTensor:
    """Fused CAB1 (``hw=None``) / CAB2 forward on packed layouts.
    ``params`` is the raw NAF dict from ``naf_params_from_tree``; for CAB2
    ``hw`` is the spatially-shifted extra-channel tensor (the depthwise
    conv1 is applied here via ``dw3x3_chw``).  ``stage`` ('gate'/'rep')
    returns that kernel's raw output early — profiling hook only."""
    if interpret is None:
        interpret = _interpret()
    t = y.t
    pf, n, cb, ws, gw, gh, padr = (y.pf, y.c, y.cb, y.ws, y.gw, y.gh,
                                   y.padr)
    dtype = y.data.dtype
    pp = pf * pf
    add_c = 0 if hw is None else hw.c
    hcb = hw.cb if hw is not None else 16
    rg = -(-2 // pf)  # ceil(2/pf): RepConv 5x5 halo in cells
    assert padr >= rg, (padr, rg)
    assert hw is None or padr >= 2, padr  # in-gate dw3x3 halo

    # VMEM is the binding constraint: budgets estimate live bytes per
    # program; caps are calibrated against observed TPU compiles per dtype
    # (env override for calibration sweeps).
    import os
    esz = jnp.dtype(dtype).itemsize
    # 14 MB (bf16): the gate budget tracks the observed scoped-VMEM well
    # (th sweep, tools/sweep_gate.py: 11.7 MB compiled and was fastest;
    # 16.3 MB did not fit the 16 MB VMEM) — cap just under the limit.
    cap_mb = float(os.environ.get('SHIFTNET_NAF_CAP_MB',
                                  '14' if esz == 2 else '4'))
    from shiftnet_tpu.ops.chw import cap_scale
    cap = int(cap_mb * cap_scale() * 1024 * 1024)
    if ws < 256:
        # Narrow-row derate — same calibration as chw.vmem_cap: observed
        # scoped-VMEM inflation is ~1.4x worse at ws=128 than at the
        # ws>=384 shapes the 14 MB cap was swept on.
        cap = cap * ws // 256
    th = _pick_th(gh, lambda t2: _gate_budget(t2, ws, pf, n, cb, hcb,
                                              add_c, esz), cap)
    th = int(os.environ.get('SHIFTNET_NAF_TH_GATE', th))  # calibration only
    assert th is not None, (gh, ws, pf, n)
    n_tiles = gh // th
    masked = (ws == gw)
    npad = ((n + LANE - 1) // LANE) * LANE
    nch = pp * cb
    nr = n + 8

    wts = prep_naf_weights(params, n, add_c, groups, dtype, cb, hcb)
    hw_data = hw.data if hw is not None else jnp.zeros(
        (t, pp * hcb, y.data.shape[2]), dtype)

    g, gsums = pl.pallas_call(
        functools.partial(
            _naf_gate_kernel, th=th, ws=ws, gw=gw, gh=gh, n=n, cb=cb,
            hcb=hcb, add_c=add_c, pf=pf, padr=padr, masked=masked, eps=eps,
            dtype=dtype),
        grid=(t, n_tiles, 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, nr, cb), lambda ti, hi, kk: (kk, 0, 0),
                               memory_space=pltpu.VMEM),   # wa
                  pl.BlockSpec((1, nr, hcb), lambda ti, hi, kk: (kk, 0, 0),
                               memory_space=pltpu.VMEM),   # wb
                  pl.BlockSpec((1, n, 1), lambda ti, hi, kk: (kk, 0, 0),
                               memory_space=pltpu.VMEM),   # c1
                  pl.BlockSpec((1, n, 1), lambda ti, hi, kk: (kk, 0, 0),
                               memory_space=pltpu.VMEM),   # c2
                  pl.BlockSpec((1, n, 9), lambda ti, hi, kk: (kk, 0, 0),
                               memory_space=pltpu.VMEM),   # dw0
                  pl.BlockSpec(memory_space=pltpu.VMEM)],  # dwc
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 8, npad), lambda ti, hi, kk: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(y.data.shape, dtype),
            jax.ShapeDtypeStruct((t, n_tiles, 8, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pp * cb, 2 * LANE + (th + 2) * ws), dtype),
            pltpu.VMEM((2, pp * hcb, 2 * LANE + (th + 4) * ws), dtype),
            pltpu.VMEM((pp * hcb, 2 * LANE + (th + 2) * ws), dtype),
            pltpu.VMEM((pp * n, 2 * LANE + (th + 2) * ws), dtype),
            pltpu.VMEM((2, nch, th * ws), dtype),
            pltpu.VMEM((nch, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=_mosaic_params(),
    )(y.data, hw_data, wts['wa'], wts.get('wb', jnp.zeros((2, nr, hcb),
                                                          dtype)),
      wts['c1'], wts['c2'], wts['dw0'],
      wts.get('dwc', jnp.zeros((hcb, 9), dtype)))

    if stage == 'gate':
        return g

    n_px = y.h * y.w
    if mid_ca:
        cag = _naf_mlp(jnp.sum(gsums[:, :, 0, :n], axis=1), n_px,
                       params['du1m'], params['du2m'], dtype)
    else:
        cag = jnp.ones((t, n), dtype)
    cag_full = jnp.zeros((t, pp, cb), dtype).at[:, :, :n].set(
        cag[:, None, :]).reshape(t, nch, 1)

    # rep budget underestimates observed VMEM by ~1.4x (measured: L2 th=12
    # budget 12.3M compiled to a 17.2M scoped allocation) — derate its cap.
    th_r = _pick_th(gh, lambda t2: _rep_budget(t2, ws, pf, n, cb, rg, esz),
                    int(cap * 0.63))
    th_r = int(os.environ.get('SHIFTNET_NAF_TH_REP', th_r))  # calibration
    n_tiles_r = gh // th_r
    phr_tbl, offr_tbl = _rep_tables(pf, ws)
    s, sums = pl.pallas_call(
        functools.partial(_naf_rep_kernel, th=th_r, ws=ws, gw=gw, gh=gh,
                          n=n, cb=cb, pf=pf, padr=padr, rg=rg,
                          masked=masked, has_cag=mid_ca, dtype=dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t, n_tiles_r, pf),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),     # g
                pl.BlockSpec((1, nch, 1), lambda ti, hi, p, *_: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),    # rep
                pl.BlockSpec(memory_space=pltpu.VMEM),    # w4
            ],
            out_specs=[
                pl.BlockSpec((1, pf * cb, th_r * ws),
                             lambda ti, hi, p, *_: (ti, p, hi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, npad),
                             lambda ti, hi, p, *_: (ti, hi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, nch, 2 * LANE + (th_r + 2 * rg) * ws),
                           dtype),
                pltpu.VMEM((5 * cb, th_r * ws), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t, nch, gh * ws), dtype),
            jax.ShapeDtypeStruct((t, n_tiles_r, 8, npad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_mosaic_params(),
    )(phr_tbl, offr_tbl, g, cag_full, wts['rep'], wts['w4'])

    if stage == 'rep':
        return s

    ca = _naf_mlp(jnp.sum(sums[:, :, 0, :n], axis=1), n_px,
                  params['du1'], params['du2'], dtype)
    ca_full = jnp.zeros((t, pp, cb), dtype).at[:, :, :n].set(
        ca[:, None, :]).reshape(t, nch, 1)

    b7 = wts['b7'] if use_last_bias else jnp.zeros((n, 1), jnp.float32)
    th_b = _pick_th(gh, lambda t2: (5 * nch * t2 * ws + 2 * n * t2 * ws * 2)
                    * esz, cap)
    n_tiles_b = gh // th_b
    out = pl.pallas_call(
        functools.partial(_naf_back_kernel, th=th_b, ws=ws, gw=gw, gh=gh,
                          n=n, cb=cb, pf=pf, padr=padr, dtype=dtype),
        grid=(t, n_tiles_b),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # y (shortcut)
            pl.BlockSpec((1, nch, th_b * ws), lambda ti, hi: (ti, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, 1), lambda ti, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # w7
            pl.BlockSpec(memory_space=pltpu.VMEM),    # beta
            pl.BlockSpec(memory_space=pltpu.VMEM),    # b7
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(y.data.shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nch, th_b * ws), dtype),
            pltpu.VMEM((2, nch, th_b * ws), dtype),
            pltpu.VMEM((nch, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        # out = shortcut + ...: every tile of y is read strictly before the
        # same tile is written (the lookahead reads and deferred writes
        # always target different tiles), so the shortcut buffer is reused
        # in place — at the 720p L1 scale this removes a 1.5 GB HBM
        # allocation per shift round (XLA inserts a copy if y is live).
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=_mosaic_params(),
    )(y.data, s, ca_full, wts['w7'], wts['beta'], b7)
    return ChwTensor(out, y.h, y.w, padr, pf, n)


def encoder_shift_block_chw(cab_params: list, x: ChwTensor, *, rounds: int,
                            boundary_patch: bool, mid_ca: bool,
                            last_bias: bool, repconv_depthwise: bool,
                            axis: str | None = None,
                            interpret: bool | None = None) -> ChwTensor:
    """``Encoder_shift_block`` (``gshift_deblur1.py:440-547``) on the packed
    layout: ``rounds`` x [temporal shift -> grouped spatial shift -> CAB2 ->
    CAB1], alternating direction.  ``cab_params``: [(cab2_naf, cab1_naf)]
    per round from ``naf_params_from_tree``.

    ``axis``: sequence-parallel mode (frame axis ``shard_map``-sharded over
    a mesh axis).  The round's shift runs as the sharded XLA pair
    (``temporal_shift_chw(axis=...)`` ppermute + local ``gsts_hw_chw``)
    instead of the fused Pallas shift kernel — the CAB kernels themselves
    are frame-local and run unchanged on the shard."""
    n = x.c
    number = n // 2 // 8
    add_c = 8 * number
    groups = n if repconv_depthwise else n // 8
    kw = dict(groups=groups, mid_ca=mid_ca, use_last_bias=last_bias,
              interpret=interpret)

    from shiftnet_tpu.ops.chw_grad import naf_cab_chw_d, shift_round_chw_d

    def one_round(x, prm, reverse):
        if axis is None:
            y, hw = shift_round_chw_d(x, add_c, number, reverse,
                                      boundary_patch)
        else:
            y = temporal_shift_chw(x, reverse=reverse,
                                   boundary_patch=boundary_patch, axis=axis)
            hw = gsts_hw_chw(y, add_c, number, reverse=reverse)
        p2, p1 = prm
        x = naf_cab_chw_d(y, hw, p2, groups, mid_ca, last_bias)
        return naf_cab_chw_d(x, None, p1, groups, mid_ca, last_bias)

    if rounds % 2 == 0 and rounds >= 2:
        # scan over (forward, reverse) round pairs: the per-round graph —
        # including every pallas_call — is traced/compiled ONCE instead of
        # ``rounds`` times (the rounds are shape-identical; weights ride a
        # stacked scan operand).
        pairs = [(cab_params[2 * i], cab_params[2 * i + 1])
                 for i in range(rounds // 2)]
        stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *pairs)

        # remat: save only the round-pair boundary activations; backward
        # re-runs the pair's kernels (the reference trains the same config
        # on 40-80 GB GPUs — without this the v5e's 16 GB can't hold the
        # per-round residuals at reference patch/sequence sizes).
        @jax.checkpoint
        def body(carry, prm):
            carry = one_round(carry, prm[0], False)
            carry = one_round(carry, prm[1], True)
            return carry, None

        x, _ = jax.lax.scan(body, x, stacked)
        return x
    for r in range(rounds):
        x = jax.checkpoint(one_round, static_argnums=(2,))(
            x, cab_params[r], r % 2 == 1)
    return x


def naf_params_from_tree(tree: dict, *, mid_ca: bool = False,
                         last_bias: bool = False,
                         add_c: int = 0) -> dict[str, jax.Array]:
    """Collect the raw NAF matrices from a CAB1/CAB2 flax param subtree
    (torch-mirrored names)."""
    off = 1 if mid_ca else 0

    def k(*path):
        v = tree
        for p in path:
            v = v[p]
        return jnp.asarray(v)

    w0 = k('body__0', 'conv', 'kernel')
    cin_ln = w0.shape[2]
    n = w0.shape[3] // 2
    params = {
        'ln_w': k('norm', 'weight'),
        'ln_b': k('norm', 'bias'),
        'w0': w0.reshape(cin_ln, 2 * n),
        'dw0': k('body__1', 'conv_2', 'conv', 'kernel')[:, :, 0, :],
        'rep5': k(f'body__{3 + off}', 'conv_1', 'conv', 'kernel'),
        'rep3': k(f'body__{3 + off}', 'conv_2', 'conv', 'kernel'),
        'w4': k(f'body__{4 + off}', 'conv', 'kernel').reshape(n, 2 * n),
        'du1': k(f'body__{6 + off}', 'conv_du__0', 'conv',
                 'kernel').reshape(n, -1),
        'du2': k(f'body__{6 + off}', 'conv_du__2', 'conv',
                 'kernel').reshape(-1, n),
        'w7': k(f'body__{7 + off}', 'conv', 'kernel').reshape(n, n),
        'beta': k('beta').reshape(n),
    }
    if mid_ca:
        params['du1m'] = k('body__3', 'conv_du__0', 'conv',
                           'kernel').reshape(n, -1)
        params['du2m'] = k('body__3', 'conv_du__2', 'conv',
                           'kernel').reshape(-1, n)
    if last_bias:
        params['b7'] = k(f'body__{7 + off}', 'conv', 'bias')
    if add_c:
        params['dwc'] = k('conv1', 'conv', 'kernel')[:, :, 0, :]
    return params
