"""CHW-flat tensor layout + fused NCHW Pallas kernels (plain CAB).

Why this layout (measured, PERF.md "Round-2 microbenchmark findings"):
NHWC puts channels on lanes, and XLA lane-pads conv/pallas HBM operands to
128 — at the TFR U-Net widths (C=24/36/48) that is a 2.7-5.3x HBM traffic
blowup, and the model is bandwidth-bound.  Storing activations as
``(T, C, rows*row_stride)`` — channels on *sublanes*, W on *lanes* — keeps
HBM dense (W=1280/640 are lane-aligned), makes DMA slices (8,128)-aligned,
and turns every KxK conv into a weights-lhs ``(C_out, K*K*C_in) @
(K*K*C_in, rows*W)`` matmul, measured at 113 TF/s vs ~16 TF/s for XLA's
NHWC conv at C=24.

Layout contract (``ChwTensor``)
-------------------------------
``data[t, c, (PADR + r) * ws + x]`` holds pixel ``(r, x)``; ``ws`` is the
row stride (W rounded up to a lane multiple, with >=2 trailing slack
columns when rounding was needed); PADR zero rows sit above and below the
image so conv kernels read halos without bounds checks, plus a 128-lane
tail.  All pad rows / slack columns / tail are ZERO — every producer
(kernels here) maintains that invariant, so zero-padding conv semantics
come for free at image borders.

When ``ws == w`` (already lane-aligned, e.g. W=1280) there is no column
slack, so a column-shifted conv tap wraps into the neighboring row; taps
with dx != 0 are masked in-kernel (reference convs zero-pad their own
input: ``gshift_deblur1.py:135-138``).

Fused plain CAB (reference ``CAB``, ``gshift_deblur1.py:141-156``):
  front kernel: conv3x3 -> PReLU -> conv3x3 (halo recompute, one HBM read)
    -> emits body output ``s`` + per-tile channel sums.
  host XLA: channel-attention MLP on the (T, C) means (CALayer,
    ``gshift_deblur1.py:54-70``).
  back kernel: out = x + s * ca[t]  (written back in ChwTensor layout).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TAIL = 128  # trailing slack lanes so last-row conv taps never read OOB


def row_stride(w: int) -> int:
    """Lane-aligned row stride: W itself when aligned, else W+>=2 slack."""
    if w % LANE == 0:
        return w
    return ((w + 2 + LANE - 1) // LANE) * LANE


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ChwTensor:
    """(T, C, LP) flat NCHW activation; see module docstring for layout."""
    data: jax.Array
    h: int
    w: int
    padr: int

    @property
    def t(self) -> int:
        return self.data.shape[0]

    @property
    def c(self) -> int:
        return self.data.shape[1]

    @property
    def ws(self) -> int:
        return row_stride(self.w)

    def tree_flatten(self):
        return (self.data,), (self.h, self.w, self.padr)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def flat_len(h: int, w: int, padr: int) -> int:
    return (h + 2 * padr) * row_stride(w) + TAIL


def from_nhwc(x: jax.Array, padr: int = 2) -> ChwTensor:
    """(T, H, W, C) -> ChwTensor.  One XLA transpose + pad (entry cost)."""
    t, h, w, c = x.shape
    ws = row_stride(w)
    y = jnp.transpose(x, (0, 3, 1, 2))                      # (T, C, H, W)
    y = jnp.pad(y, ((0, 0), (0, 0), (padr, padr), (0, ws - w)))
    y = y.reshape(t, c, (h + 2 * padr) * ws)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, TAIL)))
    return ChwTensor(y, h, w, padr)


def to_nhwc(x: ChwTensor) -> jax.Array:
    t, c, _ = x.data.shape
    ws = x.ws
    y = x.data[:, :, : (x.h + 2 * x.padr) * ws]
    y = y.reshape(t, c, x.h + 2 * x.padr, ws)
    y = y[:, :, x.padr: x.padr + x.h, : x.w]
    return jnp.transpose(y, (0, 2, 3, 1))


def repad(x: ChwTensor, padr: int) -> ChwTensor:
    """Change the pad-row count (XLA copy; only at stage boundaries)."""
    if padr == x.padr:
        return x
    t, c, _ = x.data.shape
    ws = x.ws
    y = x.data[:, :, : (x.h + 2 * x.padr) * ws]
    y = y.reshape(t, c, x.h + 2 * x.padr, ws)
    y = y[:, :, x.padr: x.padr + x.h]
    y = jnp.pad(y, ((0, 0), (0, 0), (padr, padr), (0, 0)))
    return ChwTensor(
        jnp.pad(y.reshape(t, c, (x.h + 2 * padr) * ws), ((0, 0), (0, 0),
                                                         (0, TAIL))),
        x.h, x.w, padr)


def cpad16(c: int) -> int:
    """Channel rows padded to the bf16 sublane tile (patch-stack stores must
    land at 16-multiple sublane offsets for Mosaic to relayout them)."""
    return ((c + 15) // 16) * 16


def conv_lhs(kernel: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """HWIO (kh, kw, Ci, Co) -> weights-lhs (Co, kh*kw*cpad16(Ci)) matching
    the tap-major patch assembly below (zero rows at channel padding)."""
    kh, kw, ci, co = kernel.shape
    cp = cpad16(ci)
    w = jnp.zeros((kh * kw, cp, co), kernel.dtype)
    w = w.at[:, :ci].set(kernel.reshape(kh * kw, ci, co))
    return w.reshape(kh * kw * cp, co).T.astype(dtype)


def _col_index(m: int, ws: int):
    i = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    return i - (i // ws) * ws


def _conv_via_mxu(vals, pbuf, base, n_rows, ws, w, c_in, k, lhs, masked,
                  col):
    """KxK conv as per-ky accumulated weights-lhs MXU matmuls over n_rows
    output rows.

    ``vals``: (cpad16(C), L) VMEM values whose lane ``base + j*ws + x`` is
    input row ``j`` (relative), col ``x``; channel pad rows must be zero.

    The kx-shifted tap stack is STORED once into the aligned scratch
    ``pbuf`` over the EXTENDED range (n_rows + k - 1 rows); each ky's taps
    are then an ALIGNED lane window ``pbuf[:, ky*ws : ky*ws + m]`` — k
    slab stores total instead of k*k (tap copies are the VPU bottleneck;
    Mosaic also cannot concat pieces with heterogeneous lane offsets, so
    16-aligned stores double as layout normalization).  Column-shifted
    stores are masked when the layout has no slack (a tap at col x reads
    x+dx: invalid outside [0, w); the column index of lane q in pbuf equals
    that of the out position using it, so masking at store time is exact
    for every ky).
    """
    m = n_rows * ws
    m_ext = m + (k - 1) * ws
    cs = vals.shape[0]              # rows present in vals (may be < cp)
    cp = pbuf.shape[0] // k         # block stride (16-aligned)
    r = k // 2
    for kx in range(k):
        dx = kx - r
        piece = jax.lax.slice(
            vals, (0, base + dx), (cs, base + dx + m_ext))
        if masked and dx != 0:
            ok = (col[:, :m_ext] + dx >= 0) & (col[:, :m_ext] + dx < w)
            piece = jnp.where(ok, piece, jnp.zeros_like(piece))
        pbuf[pl.ds(kx * cp, cs), pl.ds(0, m_ext)] = piece
    acc = None
    for ky in range(k):
        part = jax.lax.dot_general(
            lhs[:, ky * k * cp:(ky + 1) * k * cp],
            pbuf[:, pl.ds(ky * ws, m)],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc  # (C_out, m) f32


def _cab_front_kernel(x_hbm, w1, alpha, w2, s_ref, sums_ref, xbuf,
                      pbuf, sem, *, th, ws, w, c, h, padr, dtype):
    """conv3x3 -> PReLU -> conv3x3 with 2-row halo recompute.

    Image rows [hi*th, hi*th+th); conv1 computed on th+2 rows.  conv2
    zero-pads its OWN input in the reference (each torch conv does), so
    conv1 halo rows that fall outside the image must be re-zeroed — conv1
    at image row -1 is NOT zero (its taps reach image row 0).  Column wrap
    is masked when the layout has no slack (ws == w).
    """
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    total = pl.num_programs(0) * n_tiles
    rows_in = th + 4
    masked = (ws == w)
    cp16 = xbuf.shape[1]
    g = ti * n_tiles + hi
    slot = jax.lax.rem(g, 2)

    def start_dma(gg, sl):
        ti2 = gg // n_tiles
        hi2 = jax.lax.rem(gg, n_tiles)
        lane0 = (hi2 * th + padr - 2) * ws
        pltpu.make_async_copy(
            x_hbm.at[ti2, :, pl.ds(lane0, rows_in * ws)],
            xbuf.at[sl, pl.ds(0, c), pl.ds(LANE, rows_in * ws)],
            sem.at[sl]).start()

    # 2-slot lookahead: this program's DMA was started by the previous one;
    # kick off the next tile's DMA before waiting.
    @pl.when(g == 0)
    def _():
        # zero slack lanes / channel-pad rows once; DMAs never write them.
        xbuf[...] = jnp.zeros_like(xbuf)
        start_dma(0, 0)

    @pl.when(g + 1 < total)
    def _():
        start_dma(g + 1, jax.lax.rem(g + 1, 2))

    pltpu.make_async_copy(
        x_hbm.at[0, :, pl.ds(0, rows_in * ws)],
        xbuf.at[slot, pl.ds(0, c), pl.ds(LANE, rows_in * ws)],
        sem.at[slot]).wait()

    m1 = (th + 2) * ws
    col = _col_index((th + 4) * ws, ws) if masked else None
    # conv1 out row i (i in [0, th+2)) = image row hi*th-1+i = src row i,
    # taps read src rows i..i+2 -> base lane LANE + 0.
    y1 = _conv_via_mxu(xbuf[slot], pbuf, LANE, th + 2, ws, w, c, 3, w1[...],
                       masked, col)
    a = alpha[0, 0].astype(jnp.float32)
    y1 = jnp.maximum(y1, 0) + a * jnp.minimum(y1, 0)
    y1 = y1.astype(dtype)
    # re-zero out-of-image halo rows (y1 row i = image row hi*th-1+i) and,
    # when the layout has slack, the slack cols (the kx=+1 tap at the last
    # slack col read the next row's col 0).
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, m1), 1) // ws
    img_row = hi * th - 1 + ri
    ok = (img_row >= 0) & (img_row < h)
    if ws != w:
        ok = ok & col_slack_ok(m1, ws, w)
    y1 = jnp.where(ok, y1, jnp.zeros_like(y1))

    # conv2 consumes y1 directly from registers (no VMEM round trip);
    # lead/tail zero lanes for the dx=+-1 edge taps.
    y1p = jnp.pad(y1, ((0, 0), (LANE, LANE)))
    m2 = th * ws
    s = _conv_via_mxu(y1p, pbuf, LANE, th, ws, w, c, 3, w2[...],
                      masked, col)
    s = s.astype(dtype)
    if ws != w:
        s = jnp.where(col_slack_ok(m2, ws, w), s, jnp.zeros_like(s))
    s_ref[0] = s
    # per-tile channel sums, padded to a (8, 128) tile (Mosaic requires
    # lane/sublane-aligned output blocks)
    vec = jnp.sum(s.astype(jnp.float32), axis=1)            # (C,)
    pad = ((c + LANE - 1) // LANE) * LANE
    vec = jnp.pad(vec.reshape(1, c), ((0, 0), (0, pad - c)))
    sums_ref[0, 0] = jnp.broadcast_to(vec, (8, pad))


def col_slack_ok(m: int, ws: int, w: int):
    return _col_index(m, ws) < w


def _cab_back_kernel(x_hbm, s_ref, ca_ref, out_hbm, obuf, zbuf, sem, osem,
                     *, th, ws, w, c, padr, h, dtype):
    """out = x + s * ca[t], written in ChwTensor layout (pad rows zeroed by
    the first/last row-tile programs)."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    lane0 = (hi * th + padr) * ws

    cp = pltpu.make_async_copy(
        x_hbm.at[ti, :, pl.ds(lane0, th * ws)], obuf, sem)
    cp.start()
    zbuf[...] = jnp.zeros_like(zbuf)
    cp.wait()

    val = obuf[...] + s_ref[0] * ca_ref[0].astype(dtype)
    obuf[...] = val
    out = pltpu.make_async_copy(
        obuf, out_hbm.at[ti, :, pl.ds(lane0, th * ws)], osem)
    out.start()

    # zbuf covers pad rows + TAIL; the top write must exclude TAIL (it
    # would overwrite the start of image row 0).
    @pl.when(hi == 0)
    def _():
        zp = pltpu.make_async_copy(
            zbuf.at[:, pl.ds(0, padr * ws)],
            out_hbm.at[ti, :, pl.ds(0, padr * ws)], sem)
        zp.start()
        zp.wait()

    @pl.when(hi == n_tiles - 1)
    def _():
        zp = pltpu.make_async_copy(
            zbuf, out_hbm.at[ti, :, pl.ds((padr + h) * ws, zbuf.shape[1])],
            sem)
        zp.start()
        zp.wait()

    out.wait()


def pick_tile(h: int, ws: int, c_in: int, c_out: int, k: int = 3,
              budget: int = 11 * 1024 * 1024) -> int | None:
    """Largest row-tile that divides H and fits the front kernel's VMEM
    (Mosaic budgets by SUM of live buffers, no cross-stage reuse)."""
    cp = cpad16(c_in)
    for th in (32, 24, 16, 12, 8, 6, 4, 3, 2):
        if h % th:
            continue
        m1 = (th + 2) * ws
        m2 = th * ws
        need = (
            2 * cp * (2 * LANE + (th + 4) * ws) * 2 +  # xbuf (2 slots)
            k * cp * ((th + 4) * ws) * 2 +             # pbuf (kx tap stack)
            2 * c_out * m1 * 4 +                       # y1 acc+part f32
            c_out * (2 * LANE + m1) * 2 +              # y1p bf16
            2 * c_out * m2 * 4 +                       # y2 acc+part f32
            c_out * m2 * 2 +                           # s out
            m1 * 4 * 2                                 # col iota/masks
        )
        if need < budget:
            return th
    return None


def _interpret() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, 'platform', None) == 'cpu'
    return jax.default_backend() != 'tpu'


def cab_chw(x: ChwTensor, params: dict[str, Any], *,
            reduction: int, interpret: bool | None = None) -> ChwTensor:
    """Fused plain CAB on a ChwTensor.  ``params``: flax CAB subtree
    (body__0/body__1/body__2/CA with torch-mirrored names)."""
    if interpret is None:
        interpret = _interpret()
    t, c, lp = x.data.shape
    ws, w, h, padr = x.ws, x.w, x.h, x.padr
    assert padr >= 2, padr
    dtype = x.data.dtype
    th = pick_tile(h, ws, c, c)
    assert th is not None, (h, ws, c)
    n_tiles = h // th

    w1 = conv_lhs(params['body__0']['conv']['kernel'], dtype)
    alpha = params['body__1']['weight'].reshape(1, 1).astype(jnp.float32)
    w2 = conv_lhs(params['body__2']['conv']['kernel'], dtype)
    cpad = ((c + LANE - 1) // LANE) * LANE

    s, sums = pl.pallas_call(
        functools.partial(_cab_front_kernel, th=th, ws=ws, w=w, c=c,
                          h=h, padr=padr, dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.SMEM),   # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2
        ],
        out_specs=[
            pl.BlockSpec((1, c, th * ws), lambda ti, hi: (ti, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, cpad), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, c, h * ws), dtype),
            jax.ShapeDtypeStruct((t, n_tiles, 8, cpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cpad16(c), 2 * LANE + (th + 4) * ws), dtype),
            pltpu.VMEM((3 * cpad16(c), (th + 4) * ws), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x.data, w1, alpha, w2)

    ca = ca_mlp(sums[:, :, 0, :c], h * w, params['CA'], dtype)  # (T, C)

    out = pl.pallas_call(
        functools.partial(_cab_back_kernel, th=th, ws=ws, w=w, c=c,
                          padr=padr, h=h, dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (HBM)
            pl.BlockSpec((1, c, th * ws), lambda ti, hi: (ti, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda ti, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),   # ca
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((t, c, lp), dtype),
        scratch_shapes=[
            pltpu.VMEM((c, th * ws), dtype),
            pltpu.VMEM((c, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.data, s, ca.reshape(t, c, 1))
    return ChwTensor(out, h, w, padr)


def ca_mlp(sums: jax.Array, n_px: int, ca_params: dict, dtype) -> jax.Array:
    """CALayer attention weights from per-tile channel sums.

    Matches the XLA path's precision chain: mean in f32, 1x1 convs in
    compute dtype with f32 accumulation (``models/layers.py:163-185``).
    """
    mean = (jnp.sum(sums, axis=1) / n_px).astype(dtype)      # (T, C)
    du1 = ca_params['conv_du__0']['conv']['kernel']
    du2 = ca_params['conv_du__2']['conv']['kernel']
    z = jax.lax.dot_general(
        mean, du1.reshape(du1.shape[2], du1.shape[3]).astype(dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    z = jnp.maximum(z.astype(dtype), 0)
    z = jax.lax.dot_general(
        z, du2.reshape(du2.shape[2], du2.shape[3]).astype(dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(z.astype(dtype))
