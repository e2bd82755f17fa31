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



def vmem_limit_mb() -> float:
    """Mosaic scoped-VMEM limit in MB (round-5 finding): the "16 MB VMEM"
    wall rounds 2-4 tiled against is Mosaic's DEFAULT scoped limit, not
    hardware — the v5e has 128 MiB physical VMEM.  Raising the limit via
    pallas_call compiler_params (XLA_FLAGS can't carry TPU flags through
    the local flag parser) lets the row-tile pickers choose ~3x larger
    tiles: measured CAB2 gate 12.34 -> 10.20 ms, CAB1 8.41 -> 7.73 ms at
    the 720p L1 shape (tools/sweep_gate.py, th 4 -> 12).  Env override:
    SHIFTNET_VMEM_LIMIT_MB (0 disables -> Mosaic default)."""
    import os
    return float(os.environ.get('SHIFTNET_VMEM_LIMIT_MB', '100'))


def cap_scale() -> float:
    """Scale factor applied to the calibrated VMEM budget caps.  The caps
    were swept under the default ~16 MB scoped limit with an observed
    1.5-2.7x Mosaic inflation over hand-counted budgets; with the limit
    at L MB, budgets up to ~L/2.5 are safe.  Clamped to 4x: beyond that
    the tile pickers leave the halo-amortized regime anyway and compile
    risk grows."""
    mb = vmem_limit_mb()
    if mb <= 16:
        return 1.0
    return min(4.0, mb / 25.0)


def mosaic_params():
    """pallas_call compiler_params carrying ``vmem_limit_mb`` (None =
    Mosaic default; ignored in interpret mode)."""
    mb = vmem_limit_mb()
    if mb <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(mb * 1024 * 1024))


def row_stride(w: int) -> int:
    """Lane-aligned row stride: W itself when aligned, else W+>=2 slack."""
    if w % LANE == 0:
        return w
    return ((w + 2 + LANE - 1) // LANE) * LANE


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ChwTensor:
    """(T, P*P*cb, LP) flat NCHW activation, optionally space-to-depth
    packed.

    ``pf`` is the per-axis phase factor: logical pixel (R, X) lives on grid
    cell (R // pf, X // pf) in channel block ``p = (R % pf) * pf + (X % pf)``
    (sublanes ``[p*cb, p*cb + c)``; ``cb = cpad16(c)`` with zero pad rows so
    tap stores stay 16-aligned).  ``pf=1`` is the plain flat layout.  s2d
    packing is what makes stride-2 convs and 2x upsamples expressible as
    stride-1 phase-block convs — Mosaic has no strided lane access, so a
    flat layout cannot deinterleave columns (measured: XLA's flat
    lane-deinterleave is a 12 GB/s gather).
    """
    data: jax.Array
    h: int            # logical image height
    w: int            # logical image width
    padr: int         # zero pad rows (grid cells) above/below the image
    pf: int = 1       # per-axis phase factor (1, 2 or 4)
    c: int = -1       # logical channels (-1: data.shape[1], pf=1 only)

    def __post_init__(self):
        if self.c == -1:
            assert self.pf == 1
            self.c = self.data.shape[1]

    @property
    def t(self) -> int:
        return self.data.shape[0]

    @property
    def cb(self) -> int:
        # channel blocks padded to 16 rows in HBM for every layout: tap
        # slices and DMA block shapes must land on sublane tiles, and the
        # small variants' widths (14/18/22) are not even 8-aligned.
        return cpad16(self.c)

    @property
    def gh(self) -> int:
        return self.h // self.pf

    @property
    def gw(self) -> int:
        return self.w // self.pf

    @property
    def ws(self) -> int:
        return row_stride(self.gw)

    def tree_flatten(self):
        return (self.data,), (self.h, self.w, self.padr, self.pf, self.c)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def flat_len(gh: int, gw: int, padr: int) -> int:
    return (gh + 2 * padr) * row_stride(gw) + TAIL


def from_nhwc(x: jax.Array, padr: int = 2, pf: int = 1) -> ChwTensor:
    """(T, H, W, C) -> ChwTensor (s2d-packed when pf > 1).  One XLA
    transpose + pad (stage-entry cost only)."""
    t, h, w, c = x.shape
    assert h % pf == 0 and w % pf == 0, (h, w, pf)
    gh, gw = h // pf, w // pf
    ws = row_stride(gw)
    cb = cpad16(c)
    y = x.reshape(t, gh, pf, gw, pf, c)
    y = jnp.transpose(y, (0, 2, 4, 5, 1, 3))     # (T, a, b, C, gh, gw)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, cb - c), (padr, padr),
                    (0, ws - gw)))
    y = y.reshape(t, pf * pf * cb, (gh + 2 * padr) * ws)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, TAIL)))
    return ChwTensor(y, h, w, padr, pf, c)


def to_nhwc(x: ChwTensor) -> jax.Array:
    t = x.data.shape[0]
    pf, cb, ws = x.pf, x.cb, x.ws
    y = x.data[:, :, : (x.gh + 2 * x.padr) * ws]
    y = y.reshape(t, pf, pf, cb, x.gh + 2 * x.padr, ws)
    y = y[:, :, :, : x.c, x.padr: x.padr + x.gh, : x.gw]
    y = jnp.transpose(y, (0, 4, 1, 5, 2, 3))     # (T, gh, a, gw, b, C)
    return y.reshape(t, x.h, x.w, x.c)




def repad_chw(x: ChwTensor, padr: int) -> ChwTensor:
    """Change the zero pad-row count (one thin XLA slice/pad; the zero-pad
    invariant makes both directions content-preserving).  Used where
    tensors with different padr meet (e.g. the L2 decoder runs padr=8 for
    the shift-round kernel's halo but up21's skip carries padr=4)."""
    if padr == x.padr:
        return x
    t, nch, _ = x.data.shape
    gh, ws = x.gh, x.ws
    if padr < x.padr:
        d = x.padr - padr
        lp_new = flat_len(gh, x.gw, padr)
        # the slice's trailing TAIL lands on old bottom pad rows — zero.
        data = jax.lax.slice(x.data, (0, 0, d * ws),
                             (t, nch, d * ws + lp_new))
    else:
        d = padr - x.padr
        data = jnp.pad(x.data[:, :, : (gh + 2 * x.padr) * ws],
                       ((0, 0), (0, 0), (d * ws, d * ws + TAIL)))
    return ChwTensor(data, x.h, x.w, padr, x.pf, x.c)


def vmem_cap(esz: int, base_mb: int = 10, ws: int | None = None) -> int:
    """Calibrated VMEM budget cap: Mosaic stack-allocates unrolled
    temporaries without reuse, inflating actual usage ~2.3x over
    hand-counted buffer sums at bf16 and worse at f32 (observed compiles);
    budgets here count the big buffers only, so cap conservatively.

    The inflation worsens at narrow rows: at ws=128 (256-patch training
    shapes) the s2d front kernel compiled to 2.7x its budget (est 6.6 MB ->
    18.0 MB scoped, > the 16 MB limit) vs <=1.9x at the ws>=384 shapes the
    base caps were calibrated on — per-phase fixed temporaries amortize
    worse over narrow rows.  Derate proportionally below ws=256.
    ``cap_scale`` lifts the cap when the Mosaic scoped-VMEM limit is
    raised (round 5)."""
    cap = int(base_mb * cap_scale() * 1024 * 1024
              * (1.0 if esz == 2 else 0.42))
    if ws is not None and ws < 256:
        cap = cap * ws // 256
    return cap


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
                      pbuf, sem, *, th, ws, w, c, cb, h, padr, dtype):
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
            xbuf.at[sl, pl.ds(0, cb), pl.ds(LANE, rows_in * ws)],
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
        xbuf.at[slot, pl.ds(0, cb), pl.ds(LANE, rows_in * ws)],
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
    s_ref[0, pl.ds(0, c)] = s
    if cb != c:
        s_ref[0, pl.ds(c, cb - c)] = jnp.zeros((cb - c, th * ws), dtype)
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
              budget: int | None = None, esz: int = 2) -> int | None:
    """Largest row-tile that divides H and fits the front kernel's VMEM
    (Mosaic budgets by SUM of live buffers, no cross-stage reuse)."""
    if budget is None:
        budget = vmem_cap(esz, 11, ws)
    cp = cpad16(c_in)
    fallback = None
    for th in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
        if h % th:
            continue
        m1 = (th + 2) * ws
        m2 = th * ws
        need = (
            2 * cp * (2 * LANE + (th + 4) * ws) * esz +  # xbuf (2 slots)
            k * cp * ((th + 4) * ws) * esz +             # pbuf (kx taps)
            2 * c_out * m1 * 4 +                         # y1 acc+part f32
            c_out * (2 * LANE + m1) * esz +              # y1p
            2 * c_out * m2 * 4 +                         # y2 acc+part f32
            c_out * m2 * esz +                           # s out
            m1 * 4 * 2                                   # col iota/masks
        )
        if need < budget:
            return th
        fallback = th
    return fallback  # smallest divider: best effort for tiny/f32 shapes


def _interpret() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, 'platform', None) == 'cpu'
    return jax.default_backend() != 'tpu'


def cab_chw(x: ChwTensor, params: dict[str, Any], *,
            reduction: int, interpret: bool | None = None) -> ChwTensor:
    """Fused plain CAB on a ChwTensor (flat or s2d-packed).  ``params``:
    flax CAB subtree (body__0/body__1/body__2/CA, torch-mirrored names)."""
    if x.pf > 1:
        return _cab_chw_s2d(x, params, interpret=interpret)
    if interpret is None:
        interpret = _interpret()
    t, _, lp = x.data.shape
    c, cb = x.c, x.cb
    ws, w, h, padr = x.ws, x.w, x.h, x.padr
    assert padr >= 2, padr
    dtype = x.data.dtype
    th = pick_tile(h, ws, c, c, esz=jnp.dtype(dtype).itemsize)
    assert th is not None, (h, ws, c)
    n_tiles = h // th

    w1 = conv_lhs(params['body__0']['conv']['kernel'], dtype)
    alpha = params['body__1']['weight'].reshape(1, 1).astype(jnp.float32)
    w2 = conv_lhs(params['body__2']['conv']['kernel'], dtype)
    cpad = ((c + LANE - 1) // LANE) * LANE

    s, sums = pl.pallas_call(
        functools.partial(_cab_front_kernel, th=th, ws=ws, w=w, c=c,
                          cb=cb, h=h, padr=padr, dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.SMEM),   # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2
        ],
        out_specs=[
            pl.BlockSpec((1, cb, th * ws), lambda ti, hi: (ti, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, cpad), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cb, h * ws), dtype),
            jax.ShapeDtypeStruct((t, n_tiles, 8, cpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cpad16(c), 2 * LANE + (th + 4) * ws), dtype),
            pltpu.VMEM((3 * cpad16(c), (th + 4) * ws), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(x.data, w1, alpha, w2)

    ca = ca_mlp(sums[:, :, 0, :c], h * w, params['CA'], dtype)  # (T, C)

    ca_b = jnp.zeros((t, cb), ca.dtype).at[:, :c].set(ca)
    out = pl.pallas_call(
        functools.partial(_cab_back_kernel, th=th, ws=ws, w=w, c=cb,
                          padr=padr, h=h, dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x (HBM)
            pl.BlockSpec((1, cb, th * ws), lambda ti, hi: (ti, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, 1), lambda ti, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),   # ca
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t, cb, lp), dtype),
        scratch_shapes=[
            pltpu.VMEM((cb, th * ws), dtype),
            pltpu.VMEM((cb, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # out = x + ...: each tile is read before it is written, so the
        # shortcut buffer can be reused in place (saves one full activation
        # in HBM whenever x is dead afterwards — XLA copies otherwise).
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(x.data, s, ca_b.reshape(t, cb, 1))
    return ChwTensor(out, h, w, padr, 1, c)


# ---------------------------------------------------------------------------
# Phase (space-to-depth) machinery: stride-s KxK convs over packed layouts.
# ---------------------------------------------------------------------------


def phase_taps(pf_in: int, pf_out: int, k: int, stride: int, pad: int):
    """Per-output-phase tap table for a conv evaluated on a packed layout.

    Output phase (a, b) of a stride-``stride`` KxK conv reads logical input
    position ``stride*(pf_out*u + a) + d - pad`` = cell ``u + cd``, input
    phase ``ph`` with ``(cd, ph) = divmod(stride*a + d - pad, pf_in)``.
    Returns {(a, b): [(block, cdr, cdc)] in (dy, dx) row-major order} — the
    weights-lhs column order is (dy, dx, ci), identical for every phase, so
    one ``conv_lhs`` matrix serves all phases.
    """
    assert stride * pf_out == pf_in or (pf_in == pf_out and stride == 1)
    table = {}
    for a in range(pf_out):
        for b in range(pf_out):
            entries = []
            for dy in range(k):
                cdr, phr = divmod(stride * a + dy - pad, pf_in)
                for dx in range(k):
                    cdc, phc = divmod(stride * b + dx - pad, pf_in)
                    entries.append((phr * pf_in + phc, cdr, cdc))
            table[(a, b)] = entries
    return table


def _phase_conv(vals, pbuf, base, n_cells, ws, gw, cb, taps, lhs, masked,
                col):
    """One output phase of a packed conv: assemble the k*k tap stack from
    (block, cell-offset) slices of ``vals`` and run one weights-lhs matmul.

    ``vals``: (P*P*cb, L) slab values; lane ``base + j*ws + v`` of block
    rows is grid cell (j, v) relative to the slab.  Cell-column-crossing
    taps (cdc != 0) are masked when the layout has no slack columns.
    """
    m = n_cells * ws
    acc = None
    kk = len(taps)
    for i, (blk, cdr, cdc) in enumerate(taps):
        piece = jax.lax.slice(
            vals, (blk * cb, base + cdr * ws + cdc),
            ((blk + 1) * cb, base + cdr * ws + cdc + m))
        if masked and cdc != 0:
            ok = (col[:, :m] + cdc >= 0) & (col[:, :m] + cdc < gw)
            piece = jnp.where(ok, piece, jnp.zeros_like(piece))
        pbuf[pl.ds(i * cb, cb), pl.ds(0, m)] = piece
    out = jax.lax.dot_general(
        lhs, pbuf[pl.ds(0, kk * cb), pl.ds(0, m)], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out  # (C_out, m) f32


def _lookahead_dma(x_hbm, xbuf, sem, g, total, n_tiles, th, halo_cells,
                   ws, padr, n_ch):
    """2-slot DMA lookahead over a (T, n_tiles) grid: program g's slab was
    started by program g-1; start g+1's before waiting.  The slab covers
    grid cells [hi*th - halo_cells, hi*th + th + halo_cells) (in-bounds
    because padr >= halo_cells); slot buffers carry a LANE lead/tail slack
    that program 0 zeroes (along with channel pad rows)."""
    rows = th + 2 * halo_cells

    def start(gg, sl):
        hi2 = jax.lax.rem(gg, n_tiles)
        lane0 = (hi2 * th + padr - halo_cells) * ws
        pltpu.make_async_copy(
            x_hbm.at[gg // n_tiles, :, pl.ds(lane0, rows * ws)],
            xbuf.at[sl, pl.ds(0, n_ch), pl.ds(LANE, rows * ws)],
            sem.at[sl]).start()

    @pl.when(g == 0)
    def _():
        xbuf[...] = jnp.zeros_like(xbuf)
        start(0, 0)

    @pl.when(g + 1 < total)
    def _():
        start(g + 1, jax.lax.rem(g + 1, 2))

    slot = jax.lax.rem(g, 2)
    pltpu.make_async_copy(
        x_hbm.at[0, :, pl.ds(0, rows * ws)],
        xbuf.at[slot, pl.ds(0, n_ch), pl.ds(LANE, rows * ws)],
        sem.at[slot]).wait()
    return slot


def _emit_tile(out_hbm, obuf, zbuf, osem, zsem, ti, hi, n_tiles, th, ws,
               padr, gh):
    """Write a (C, th*ws) tile into a padded-layout output, zeroing the pad
    rows + tail on the first/last row-tile programs."""
    out = pltpu.make_async_copy(
        obuf, out_hbm.at[ti, :, pl.ds((hi * th + padr) * ws, th * ws)], osem)
    out.start()

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

    out.wait()


def _cab_front_s2d_kernel(x_hbm, w1, alpha, w2, s_ref, sums_ref, xbuf,
                          y1buf, pbuf, sem, *, th, ws, gw, gh, c, cb, pf,
                          padr, taps1, taps2, masked, dtype):
    """Packed-layout conv3x3 -> PReLU -> conv3x3 (one cell-row halo
    recompute), per output phase.  Same structure as the flat front kernel:
    conv1 is computed on th+2 cell rows; its out-of-image cell rows are
    re-zeroed (each reference conv zero-pads its own input)."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    g = ti * n_tiles + hi
    slot = _lookahead_dma(x_hbm, xbuf, sem, g, pl.num_programs(0) * n_tiles,
                          n_tiles, th, 2, ws, padr, pf * pf * cb)

    @pl.when(g == 0)
    def _():
        y1buf[...] = jnp.zeros_like(y1buf)

    m1 = (th + 2) * ws
    m2 = th * ws
    col = _col_index((th + 4) * ws, ws) if masked else None
    a_s = alpha[0, 0].astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, m1), 1) // ws
    cell_row = hi * th - 1 + ri
    row_ok = (cell_row >= 0) & (cell_row < gh)
    if masked:
        y1ok = row_ok
    else:
        y1ok = row_ok & col_slack_ok(m1, ws, gw)

    xvals = xbuf[slot]
    for p, (a, b) in enumerate([(a, b) for a in range(pf) for b in range(pf)]):
        y1 = _phase_conv(xvals, pbuf, LANE + ws, th + 2, ws, gw, cb,
                         taps1[(a, b)], w1[...], masked, col)
        y1 = jnp.maximum(y1, 0) + a_s * jnp.minimum(y1, 0)
        y1 = jnp.where(y1ok, y1, jnp.zeros_like(y1)).astype(dtype)
        y1buf[pl.ds(p * cb, c), pl.ds(LANE, m1)] = y1

    y1vals = y1buf[...]
    acc = None
    for p, (a, b) in enumerate([(a, b) for a in range(pf) for b in range(pf)]):
        y2 = _phase_conv(y1vals, pbuf, LANE + ws, th, ws, gw, cb,
                         taps2[(a, b)], w2[...], masked, col)
        s = y2.astype(dtype)
        if not masked:
            s = jnp.where(col_slack_ok(m2, ws, gw), s, jnp.zeros_like(s))
        s_ref[0, pl.ds(p * cb, c)] = s
        if cb != c:
            s_ref[0, pl.ds(p * cb + c, cb - c)] = jnp.zeros(
                (cb - c, m2), dtype)
        part = jnp.sum(s.astype(jnp.float32), axis=1)
        acc = part if acc is None else acc + part

    pad = ((c + LANE - 1) // LANE) * LANE
    vec = jnp.pad(acc.reshape(1, c), ((0, 0), (0, pad - c)))
    sums_ref[0, 0] = jnp.broadcast_to(vec, (8, pad))


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


def _phases(pf: int):
    return [(a, b) for a in range(pf) for b in range(pf)]


def pick_tile_s2d(gh: int, ws: int, pf: int, cb: int, c_out: int,
                  budget: int | None = None,
                  esz: int = 2) -> int | None:
    if budget is None:
        budget = vmem_cap(esz, 11, ws)
    nch = pf * pf * cb
    fallback = None
    for th in (16, 12, 8, 6, 4, 3, 2, 1):
        if gh % th:
            continue
        m1 = (th + 2) * ws
        need = (
            2 * nch * (2 * LANE + (th + 4) * ws) * esz +  # xbuf (2 slots)
            nch * (2 * LANE + m1) * esz +                 # y1buf
            9 * cb * m1 * esz +                           # pbuf
            2 * c_out * m1 * 4 +                          # phase-conv f32
            nch * th * ws * esz +                         # s out block
            m1 * 4 * 2                                    # col masks
        )
        if need < budget:
            return th
        fallback = th
    return fallback  # smallest divider: best effort for tiny/f32 shapes


def _expand_ca(ca: jax.Array, pf: int, c: int, cb: int) -> jax.Array:
    """(T, C) logical channel scales -> (T, P*P*cb, 1) phase-tiled (zeros at
    channel pad rows; safe because s pad rows are zeroed by the front)."""
    t = ca.shape[0]
    if pf == 1 and cb == c:
        return ca.reshape(t, c, 1)
    full = jnp.zeros((t, pf * pf, cb), ca.dtype)
    full = full.at[:, :, :c].set(ca[:, None, :])
    return full.reshape(t, pf * pf * cb, 1)


def _run_back(x: ChwTensor, s: jax.Array, ca: jax.Array,
              interpret: bool) -> ChwTensor:
    """out = x + s * ca (phase-expanded), emitted in ChwTensor layout."""
    t, nch, lp = x.data.shape
    ws, gh, padr = x.ws, x.gh, x.padr
    dtype = x.data.dtype
    th = next(t2 for t2 in (32, 16, 8, 4, 2, 1)
              if gh % t2 == 0 and
              (3 * nch * t2 * ws + nch * (padr * ws + TAIL))
              * jnp.dtype(dtype).itemsize
              < vmem_cap(jnp.dtype(dtype).itemsize, 10, ws))
    n_tiles = gh // th
    out = pl.pallas_call(
        functools.partial(_cab_back_kernel, th=th, ws=ws, w=x.gw, c=nch,
                          padr=padr, h=gh, dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, nch, th * ws), lambda ti, hi: (ti, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, 1), lambda ti, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t, nch, lp), dtype),
        scratch_shapes=[
            pltpu.VMEM((nch, th * ws), dtype),
            pltpu.VMEM((nch, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # in-place over the shortcut (read-before-write per tile).
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(x.data, s, _expand_ca(ca, x.pf, x.c, x.cb).astype(dtype))
    return ChwTensor(out, x.h, x.w, padr, x.pf, x.c)


def _cab_chw_s2d(x: ChwTensor, params: dict[str, Any],
                 interpret: bool | None = None) -> ChwTensor:
    if interpret is None:
        interpret = _interpret()
    t = x.t
    pf, c, cb, ws, gw, gh, padr = x.pf, x.c, x.cb, x.ws, x.gw, x.gh, x.padr
    assert padr >= 2, padr
    dtype = x.data.dtype
    nch = pf * pf * cb
    th = pick_tile_s2d(gh, ws, pf, cb, c, esz=jnp.dtype(dtype).itemsize)
    assert th is not None, (gh, ws, pf, cb)
    n_tiles = gh // th
    masked = (ws == gw)

    w1 = conv_lhs(params['body__0']['conv']['kernel'], dtype)
    alpha = params['body__1']['weight'].reshape(1, 1).astype(jnp.float32)
    w2 = conv_lhs(params['body__2']['conv']['kernel'], dtype)
    taps = phase_taps(pf, pf, 3, 1, 1)
    cpad = ((c + LANE - 1) // LANE) * LANE

    s, sums = pl.pallas_call(
        functools.partial(_cab_front_s2d_kernel, th=th, ws=ws, gw=gw, gh=gh,
                          c=c, cb=cb, pf=pf, padr=padr, taps1=taps,
                          taps2=taps, masked=masked, dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1
            pl.BlockSpec(memory_space=pltpu.SMEM),   # alpha
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2
        ],
        out_specs=[
            pl.BlockSpec((1, nch, th * ws), lambda ti, hi: (ti, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, cpad), lambda ti, hi: (ti, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, nch, gh * ws), dtype),
            jax.ShapeDtypeStruct((t, n_tiles, 8, cpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nch, 2 * LANE + (th + 4) * ws), dtype),
            pltpu.VMEM((nch, 2 * LANE + (th + 2) * ws), dtype),
            pltpu.VMEM((9 * cb, (th + 2) * ws), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(x.data, w1, alpha, w2)

    ca = ca_mlp(sums[:, :, 0, :c], x.h * x.w, params['CA'], dtype)
    return _run_back(x, s, ca, interpret)


def _down_kernel(x_hbm, wlhs, bias, alpha, out_hbm, xbuf, pbuf, obuf, zbuf,
                 sem, osem, zsem, *, th, ws, gw, gh, cb_in, pf_in, c_out,
                 cb_out, pf_out, padr, taps, masked, use_bias, use_prelu,
                 dtype):
    """Generic phase-packed conv (stride 1 or 2 folded into the phase
    mapping; any K), optional bias / PReLU.  Covers the reference
    DownSample (``gshift_deblur1.py:330-340``), the k=2 ``down01``
    (``:560-562``), and plain 3x3/5x5 convs (``conv``, ``:135-138``)."""
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    g = ti * n_tiles + hi
    halo = max(1, max(abs(cd) for tp in taps for _, cd, _ in tp))
    slot = _lookahead_dma(x_hbm, xbuf, sem, g, pl.num_programs(0) * n_tiles,
                          n_tiles, th, halo, ws, padr,
                          pf_in * pf_in * cb_in)

    @pl.when(g == 0)
    def _():
        obuf[...] = jnp.zeros_like(obuf)
        zbuf[...] = jnp.zeros_like(zbuf)

    m = th * ws
    col = _col_index((th + 2 * halo) * ws, ws) if masked else None
    xvals = xbuf[slot]
    for p, (a, b) in enumerate(_phases(pf_out)):
        o = _phase_conv(xvals, pbuf, LANE + halo * ws, th, ws, gw, cb_in,
                        taps[p], wlhs[...], masked, col)
        if use_bias:
            o = o + bias[...].astype(jnp.float32)
        if use_prelu:
            a_s = alpha[0, 0].astype(jnp.float32)
            o = jnp.maximum(o, 0) + a_s * jnp.minimum(o, 0)
        o = o.astype(dtype)
        if not masked:
            o = jnp.where(col_slack_ok(m, ws, gw), o, jnp.zeros_like(o))
        obuf[pl.ds(p * cb_out, c_out), :] = o
    _emit_tile(out_hbm, obuf, zbuf, osem, zsem, ti, hi, n_tiles, th, ws,
               padr, gh)


def _conv_cat_kernel(*args, th, ws, gw, gh, cb_in, pf, c_out, cb_out,
                     padr, taps, masked, use_bias, use_prelu, n_in, dtype):
    """conv over a virtual channel-concat of ``n_in`` same-layout inputs:
    each input's slab is DMA'd separately and its weights-lhs matmul is
    accumulated in f32 values (conv is linear in its input channels) —
    the concatenated tensor never exists, in VMEM or HBM."""
    x_hbms = args[:n_in]
    wlhs, bias, alpha = args[n_in:n_in + 3]
    out_hbm = args[n_in + 3]
    xbuf, pbuf, obuf, zbuf, sem, osem, zsem = args[n_in + 4:]
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    total = pl.num_programs(0) * n_tiles
    g = ti * n_tiles + hi
    halo = max(1, max(abs(cd) for tp in taps for _, cd, _ in tp))
    rows = th + 2 * halo
    nch = pf * pf * cb_in

    def start(gg, sl):
        hi2 = jax.lax.rem(gg, n_tiles)
        lane0 = (hi2 * th + padr - halo) * ws
        for j, xh in enumerate(x_hbms):
            pltpu.make_async_copy(
                xh.at[gg // n_tiles, :, pl.ds(lane0, rows * ws)],
                xbuf.at[sl, pl.ds(j * nch, nch), pl.ds(LANE, rows * ws)],
                sem.at[sl, j]).start()

    @pl.when(g == 0)
    def _():
        xbuf[...] = jnp.zeros_like(xbuf)
        obuf[...] = jnp.zeros_like(obuf)
        zbuf[...] = jnp.zeros_like(zbuf)
        start(0, 0)

    @pl.when(g + 1 < total)
    def _():
        start(g + 1, jax.lax.rem(g + 1, 2))

    slot = jax.lax.rem(g, 2)
    for j in range(n_in):   # shape-only waits, one per started copy
        pltpu.make_async_copy(
            x_hbms[0].at[0, :, pl.ds(0, rows * ws)],
            xbuf.at[slot, pl.ds(0, nch), pl.ds(LANE, rows * ws)],
            sem.at[slot, j]).wait()

    m = th * ws
    col = _col_index((th + 2 * halo) * ws, ws) if masked else None
    for p in range(pf * pf):
        o = None
        for j in range(n_in):
            xv = xbuf[slot, pl.ds(j * nch, nch)]
            oj = _phase_conv(xv, pbuf, LANE + halo * ws, th, ws, gw, cb_in,
                             taps[p], wlhs[j], masked, col)
            o = oj if o is None else o + oj
        if use_bias:
            o = o + bias[...].astype(jnp.float32)
        if use_prelu:
            a_s = alpha[0, 0].astype(jnp.float32)
            o = jnp.maximum(o, 0) + a_s * jnp.minimum(o, 0)
        o = o.astype(dtype)
        if not masked:
            o = jnp.where(col_slack_ok(m, ws, gw), o, jnp.zeros_like(o))
        obuf[pl.ds(p * cb_out, c_out), :] = o
    _emit_tile(out_hbm, obuf, zbuf, osem, zsem, ti, hi, n_tiles, th, ws,
               padr, gh)


def conv_concat_chw(xs: list[ChwTensor], kerns: list[jax.Array],
                    bias: jax.Array | None, alpha: jax.Array | None, *,
                    interpret: bool | None = None) -> ChwTensor:
    """``conv_chw(concat_chw(xs), concat(kerns, axis=2), bias, alpha)``
    without ever materializing the channel concat (convolution is linear
    in its input channels: conv(cat(a, b)) == conv_a(a) + conv_b(b)).
    At long 720p windows the packed concats this replaces were the
    largest HLO temps of the whole forward (5.4 GB at T=52).  Stride 1;
    all inputs must share layout (pf, c, grid); all kernels the same
    (k, k, c_in) per input and one c_out."""
    if interpret is None:
        interpret = _interpret()
    a = xs[0]
    n_in = len(xs)
    assert all(x.data.shape == a.data.shape and x.pf == a.pf
               and x.c == a.c and x.padr == a.padr for x in xs)
    assert all(k.shape == kerns[0].shape for k in kerns)
    t = a.t
    pf, cb, ws, gw, gh, padr = a.pf, a.cb, a.ws, a.gw, a.gh, a.padr
    dtype = a.data.dtype
    k = kerns[0].shape[0]
    c_out = kerns[0].shape[3]
    cb_out = cpad16(c_out)
    nch_out = pf * pf * cb_out
    masked = (ws == gw)

    wlhs = jnp.stack([conv_lhs(kj, dtype) for kj in kerns])
    tbl = phase_taps(pf, pf, k, 1, k // 2)
    taps = [tbl[(ai, bi)] for ai in range(pf) for bi in range(pf)]
    halo = max(1, max(abs(cd) for tp in taps for _, cd, _ in tp))
    assert padr >= halo, (padr, halo)

    bias_a = (bias.reshape(c_out, 1).astype(jnp.float32)
              if bias is not None else jnp.zeros((c_out, 1), jnp.float32))
    alpha_a = (alpha.reshape(1, 1).astype(jnp.float32)
               if alpha is not None else jnp.zeros((1, 1), jnp.float32))

    esz = jnp.dtype(dtype).itemsize
    th = next((t2 for t2 in (16, 12, 8, 6, 4, 3, 2, 1) if gh % t2 == 0 and
               (2 * n_in * pf * pf * cb * (2 * LANE + (t2 + 2 * halo) * ws)
                * esz + k * k * cb * t2 * ws * esz
                + 2 * c_out * t2 * ws * 4
                + 2 * nch_out * t2 * ws * esz) < vmem_cap(esz, 10, ws)),
              next(t2 for t2 in (1, 2, 3) if gh % t2 == 0))
    n_tiles = gh // th
    lp = flat_len(gh, gw, padr)

    out = pl.pallas_call(
        functools.partial(_conv_cat_kernel, th=th, ws=ws, gw=gw, gh=gh,
                          cb_in=cb, pf=pf, c_out=c_out, cb_out=cb_out,
                          padr=padr, taps=taps, masked=masked,
                          use_bias=bias is not None,
                          use_prelu=alpha is not None, n_in=n_in,
                          dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wlhs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec(memory_space=pltpu.SMEM),   # alpha
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t, nch_out, lp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n_in * pf * pf * cb,
                        2 * LANE + (th + 2 * halo) * ws), dtype),
            pltpu.VMEM((k * k * cb, th * ws), dtype),
            pltpu.VMEM((nch_out, th * ws), dtype),
            pltpu.VMEM((nch_out, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA((2, n_in)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(*[x.data for x in xs], wlhs, bias_a, alpha_a)
    return ChwTensor(out, a.h, a.w, padr, pf, c_out)


def conv_chw(x: ChwTensor, kern: jax.Array, bias: jax.Array | None,
             alpha: jax.Array | None, *, stride: int = 1,
             interpret: bool | None = None) -> ChwTensor:
    """Generic conv on a packed layout: stride 1 keeps the phase factor,
    stride 2 halves it (same grid).  ``kern`` is HWIO; ``bias`` (C_out,) or
    None; ``alpha`` a PReLU scalar or None."""
    if interpret is None:
        interpret = _interpret()
    t = x.t
    pf, cb, ws, gw, gh, padr = x.pf, x.cb, x.ws, x.gw, x.gh, x.padr
    dtype = x.data.dtype
    k = kern.shape[0]
    pad = k // 2 if stride == 1 else (1 if k == 3 else 0)
    c_out = kern.shape[3]
    pf_out = pf // stride
    assert pf_out >= 1
    cb_out = cpad16(c_out)
    nch_out = pf_out * pf_out * cb_out
    masked = (ws == gw)

    wlhs = conv_lhs(kern, dtype)
    tbl = phase_taps(pf, pf_out, k, stride, pad)
    taps = [tbl[(a, b)] for a in range(pf_out) for b in range(pf_out)]
    halo = max(1, max(abs(cd) for tp in taps for _, cd, _ in tp))
    assert padr >= halo, (padr, halo)

    bias_a = (bias.reshape(c_out, 1).astype(jnp.float32)
              if bias is not None else jnp.zeros((c_out, 1), jnp.float32))
    alpha_a = (alpha.reshape(1, 1).astype(jnp.float32)
               if alpha is not None else jnp.zeros((1, 1), jnp.float32))

    esz = jnp.dtype(dtype).itemsize
    th = next((t2 for t2 in (16, 12, 8, 6, 4, 3, 2, 1) if gh % t2 == 0 and
               (2 * pf * pf * cb * (2 * LANE + (t2 + 2 * halo) * ws) * esz
                + k * k * cb * t2 * ws * esz + 2 * c_out * t2 * ws * 4
                + 2 * nch_out * t2 * ws * esz) < vmem_cap(esz, 10, ws)),
              next(t2 for t2 in (1, 2, 3) if gh % t2 == 0))
    assert th is not None
    n_tiles = gh // th
    lp = flat_len(gh, gw, padr)

    out = pl.pallas_call(
        functools.partial(_down_kernel, th=th, ws=ws, gw=gw, gh=gh,
                          cb_in=cb, pf_in=pf, c_out=c_out, cb_out=cb_out,
                          pf_out=pf_out, padr=padr, taps=taps,
                          masked=masked, use_bias=bias is not None,
                          use_prelu=alpha is not None, dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wlhs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec(memory_space=pltpu.SMEM),   # alpha
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t, nch_out, lp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, pf * pf * cb, 2 * LANE + (th + 2 * halo) * ws),
                       dtype),
            pltpu.VMEM((k * k * cb, th * ws), dtype),
            pltpu.VMEM((nch_out, th * ws), dtype),
            pltpu.VMEM((nch_out, padr * ws + TAIL), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(x.data, wlhs, bias_a, alpha_a)
    return ChwTensor(out, x.h // stride, x.w // stride, padr, pf_out, c_out)


def down_chw(x: ChwTensor, params: dict[str, Any], c_out: int, *,
             with_prelu: bool = False,
             interpret: bool | None = None) -> ChwTensor:
    """Reference DownSample: stride-2 3x3 conv (+bias, or bias-free +
    PReLU) on a packed layout.  Output phase factor halves; same grid."""
    if with_prelu:
        return conv_chw(x, params['down__0']['conv']['kernel'], None,
                        params['down__1']['weight'], stride=2,
                        interpret=interpret)
    return conv_chw(x, params['down']['conv']['kernel'],
                    params['down']['conv']['bias'], None, stride=2,
                    interpret=interpret)


def add_chw(a: ChwTensor, b: ChwTensor) -> ChwTensor:
    assert a.data.shape == b.data.shape and a.pf == b.pf
    return ChwTensor(a.data + b.data, a.h, a.w, a.padr, a.pf, a.c)


def concat_chw(tensors: list[ChwTensor]) -> ChwTensor:
    """Channel concat of same-shape packed tensors (reference
    ``torch.cat(..., dim=1)``): a per-phase block restack in XLA."""
    a = tensors[0]
    pp = a.pf * a.pf
    c_out = sum(x.c for x in tensors)
    cb_out = cpad16(c_out)
    # In-place updates into one zeros buffer instead of
    # slice+concatenate+pad: XLA fuses each strided read into its update
    # copy, so peak HBM is inputs + output — the slice/pad temporaries
    # (2.7-5.4 GB each at T=52 720p) never materialize.
    out = jnp.zeros((a.t, pp, cb_out, a.data.shape[-1]), a.data.dtype)
    off = 0
    for x in tensors:
        part = x.data.reshape(x.t, pp, x.cb, -1)[:, :, :x.c]
        out = jax.lax.dynamic_update_slice(out, part, (0, 0, off, 0))
        off += x.c
    return ChwTensor(out.reshape(a.t, pp * cb_out, -1), a.h, a.w, a.padr,
                     a.pf, c_out)


def pixel_shuffle_chw(y: ChwTensor, scale: int = 2) -> ChwTensor:
    """torch ``F.pixel_shuffle`` on a packed layout: with the conv output
    at phase factor pf, depth-to-space is a pure channel-block relabeling
    (out phase (A,B) block = in phase (A//2,B//2) block rows
    ``[c*(A%2*2+B%2)... ]`` for torch ordering out[c, 2h+i, 2w+j] =
    in[c*4+i*2+j, h, w]; reference ``gshift_deblur1.py:256-278``)."""
    assert scale == 2
    pf = y.pf
    pf_out = 2 * pf
    c4 = y.c
    c_out = c4 // 4
    cb_out = cpad16(c_out)
    pp = pf * pf
    d = y.data.reshape(y.t, pp, y.cb, -1)
    blocks = []
    for A in range(pf_out):
        for B in range(pf_out):
            a, i = divmod(A, 2)
            b, j = divmod(B, 2)
            src = d[:, (a * pf + b):(a * pf + b) + 1]
            blk = jnp.concatenate(
                [src[:, :, c * 4 + i * 2 + j: c * 4 + i * 2 + j + 1]
                 for c in range(c_out)], axis=2)
            blk = jnp.pad(blk, ((0, 0), (0, 0), (0, cb_out - c_out),
                                (0, 0)))
            blocks.append(blk)
    out = jnp.concatenate(blocks, axis=1)
    return ChwTensor(out.reshape(y.t, pf_out * pf_out * cb_out, -1),
                     2 * y.h, 2 * y.w, y.padr, pf_out, c_out)


def _up_kernel(x_hbm, skip_hbm, w11, out_hbm, xbuf, sbuf, zbuf2, obuf,
               zpad, sem, ssem, osem, zsem, *, th, ws, gw, gh, cb_in,
               pf_in, c_out, cb_out, pf_out, padr, masked, dtype):
    """SkipUpSample (``gshift_deblur1.py:341-351``): 1x1 conv (commuted
    before the 2x bilinear — both are linear), bilinear up2x with torch
    half-pixel weights (0.75/0.25) and edge clamping, plus skip add.

    Packed layouts make the 2x upsample a pure phase expansion: out phase
    (a, b) = separable blends of the 1x1-transformed input phases at cell
    offsets {-1, 0, +1} — no lane interleaving.  Edge clamping == adding the
    near-tap again where the neighbor falls outside the image (the clamped
    neighbor equals the center there), applied via cell row/col masks.
    """
    ti = pl.program_id(0)
    hi = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    g = ti * n_tiles + hi
    slot = _lookahead_dma(x_hbm, xbuf, sem, g, pl.num_programs(0) * n_tiles,
                          n_tiles, th, 1, ws, padr, pf_in * pf_in * cb_in)
    scp = pltpu.make_async_copy(
        skip_hbm.at[ti, :, pl.ds((hi * th + padr) * ws, th * ws)], sbuf,
        ssem)
    scp.start()

    @pl.when(g == 0)
    def _():
        zbuf2[...] = jnp.zeros_like(zbuf2)
        zpad[...] = jnp.zeros_like(zpad)
        obuf[...] = jnp.zeros_like(obuf)

    m1 = (th + 2) * ws
    m = th * ws
    f32 = jnp.float32
    xvals = xbuf[slot]
    # 1x1 conv per input phase over the haloed slab (commuted: cheaper at
    # low res, exactly equal since both ops are linear).
    for p in range(pf_in * pf_in):
        z = jax.lax.dot_general(
            w11[...],
            jax.lax.slice(xvals, (p * cb_in, LANE),
                          ((p + 1) * cb_in, LANE + m1)),
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        zbuf2[pl.ds(p * cb_out, c_out), pl.ds(LANE, m1)] = z.astype(dtype)

    zv = zbuf2[...]
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    cell_row = hi * th + ri // ws
    cell_col = ri - (ri // ws) * ws
    mask_top = (cell_row == 0).astype(f32)
    mask_bot = (cell_row == gh - 1).astype(f32)
    mask_l = (cell_col == 0).astype(f32)
    mask_r = (cell_col == gw - 1).astype(f32)

    def zslice(ph_r, ph_c, cdr, cdc):
        blk = ph_r * pf_in + ph_c
        base = LANE + ws + cdr * ws + cdc
        piece = jax.lax.slice(zv, (blk * cb_out, base),
                              ((blk * cb_out) + c_out, base + m))
        if masked and cdc != 0:
            # wrapped columns: neighbor outside image; the clamp fixup
            # re-adds the center there, so zero the wrap.
            ok = (cell_col + cdc >= 0) & (cell_col + cdc < gw)
            piece = jnp.where(ok, piece, jnp.zeros_like(piece))
        return piece.astype(f32)

    scp.wait()
    for a in range(pf_out):
        nr_r, nr_roff = a // 2, 0
        if a % 2 == 0:
            nb_roff, nb_r = divmod(a // 2 - 1, pf_in)
            rmask = mask_top if a == 0 else None
        else:
            nb_roff, nb_r = divmod(a // 2 + 1, pf_in)
            rmask = mask_bot if a == pf_out - 1 else None
        for b in range(pf_out):
            nr_c, nr_coff = b // 2, 0
            if b % 2 == 0:
                nb_coff, nb_c = divmod(b // 2 - 1, pf_in)
                cmask = mask_l if b == 0 else None
            else:
                nb_coff, nb_c = divmod(b // 2 + 1, pf_in)
                cmask = mask_r if b == pf_out - 1 else None
            # row blend for each column tap (near / neighbor)
            def rowblend(ph_c, coff):
                v = (0.75 * zslice(nr_r, ph_c, nr_roff, coff)
                     + 0.25 * zslice(nb_r, ph_c, nb_roff, coff))
                if rmask is not None:
                    v = v + 0.25 * rmask * zslice(nr_r, ph_c, nr_roff, coff)
                return v
            out = 0.75 * rowblend(nr_c, nr_coff) + 0.25 * rowblend(
                nb_c, nb_coff)
            if cmask is not None:
                out = out + 0.25 * cmask * rowblend(nr_c, nr_coff)
            if not masked:
                # neighbor taps read real data across cell boundaries at
                # the slack columns; keep the layout's zero-slack invariant
                out = jnp.where(cell_col < gw, out, jnp.zeros_like(out))
            p = a * pf_out + b
            skip = sbuf[pl.ds(p * cb_out, c_out), :].astype(f32)
            obuf[pl.ds(p * cb_out, c_out), :] = (out + skip).astype(dtype)

    _emit_tile(out_hbm, obuf, zpad, osem, zsem, ti, hi, n_tiles, th, ws,
               padr, gh)


def up_skip_chw(x: ChwTensor, params: dict[str, Any], skip: ChwTensor, *,
                interpret: bool | None = None) -> ChwTensor:
    """SkipUpSample on packed layouts: out = bilinear2x(conv1x1(x)) + skip.
    Output matches ``skip``'s shape (phase factor doubles; same grid)."""
    if interpret is None:
        interpret = _interpret()
    x = repad_chw(x, skip.padr)  # output shares the skip buffer's layout
    t = x.t
    pf, cb, ws, gw, gh, padr = x.pf, x.cb, x.ws, x.gw, x.gh, x.padr
    dtype = x.data.dtype
    pf_out = 2 * pf
    c_out = skip.c
    assert skip.pf == pf_out and skip.gh == gh and skip.ws == ws
    cb_out = skip.cb
    nch_out = pf_out * pf_out * cb_out
    masked = (ws == gw)

    kern = params['up__1']['conv']['kernel']        # (1, 1, C_in, C_out)
    c_in = kern.shape[2]
    w11 = jnp.zeros((cb, c_out), kern.dtype).at[:c_in].set(
        kern.reshape(c_in, c_out)).T.astype(dtype)  # (C_out, cb_in)

    esz = jnp.dtype(dtype).itemsize
    th = next((t2 for t2 in (16, 12, 8, 6, 4, 3, 2, 1) if gh % t2 == 0 and
               (2 * pf * pf * cb * (2 * LANE + (t2 + 2) * ws) * esz
                + pf * pf * cb_out * (2 * LANE + (t2 + 2) * ws) * esz
                + 3 * nch_out * t2 * ws * esz
                + 6 * c_out * t2 * ws * 4) < vmem_cap(esz, 11, ws)),
              next(t2 for t2 in (1, 2, 3) if gh % t2 == 0))
    assert th is not None
    n_tiles = gh // th
    lp = flat_len(gh, gw, padr)

    out = pl.pallas_call(
        functools.partial(_up_kernel, th=th, ws=ws, gw=gw, gh=gh, cb_in=cb,
                          pf_in=pf, c_out=c_out, cb_out=cb_out,
                          pf_out=pf_out, padr=padr, masked=masked,
                          dtype=dtype),
        grid=(t, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x
            pl.BlockSpec(memory_space=pl.ANY),    # skip
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w 1x1
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t, nch_out, lp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, pf * pf * cb, 2 * LANE + (th + 2) * ws), dtype),
            pltpu.VMEM((nch_out, th * ws), dtype),                 # sbuf
            pltpu.VMEM((pf * pf * cb_out, 2 * LANE + (th + 2) * ws), dtype),
            pltpu.VMEM((nch_out, th * ws), dtype),                 # obuf
            pltpu.VMEM((nch_out, padr * ws + TAIL), dtype),        # zpad
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # out = up + skip: skip tile hi is read (and waited on) before the
        # same tile is written, so the skip buffer is reused in place.
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=mosaic_params(),
    )(x.data, skip.data, w11)
    return ChwTensor(out, skip.h, skip.w, padr, pf_out, c_out)


def tfr_unet_chw(params: dict[str, Any], x: ChwTensor, *, reduction: int,
                 downsample_prelu: bool = False,
                 interpret: bool | None = None) -> ChwTensor:
    """Full TFR_UNet (``gshift_deblur1.py:681-722``) on packed CHW layouts:
    full-res s2d(4x4), half-res s2d(2x2), quarter-res flat — all living on
    one quarter-resolution grid so every stride-2 down / 2x up is a
    stride-1 phase-block kernel.  ``params`` is the TFRUNet flax subtree
    (torch-mirrored names)."""
    kw = dict(reduction=reduction, interpret=interpret)
    dkern = 'down__0' if downsample_prelu else 'down'
    c1 = params['down12'][dkern]['conv']['kernel'].shape[-1]
    c2 = params['down23'][dkern]['conv']['kernel'].shape[-1]

    enc1 = cab_chw(x, params['encoder_level1__0'], **kw)
    y = down_chw(enc1, params['down12'], c1, with_prelu=downsample_prelu,
                 interpret=interpret)
    for i in range(3):
        y = cab_chw(y, params[f'encoder_level2__{i}'], **kw)
    enc2 = y
    y = down_chw(enc2, params['down23'], c2, with_prelu=downsample_prelu,
                 interpret=interpret)
    for i in range(3):
        y = cab_chw(y, params[f'encoder_level3__{i}'], **kw)
    for i in range(3):
        y = cab_chw(y, params[f'decoder_level3__{i}'], **kw)
    skip2 = cab_chw(enc2, params['skip_attn2'], **kw)
    y = up_skip_chw(y, params['up32'], skip2, interpret=interpret)
    for i in range(3):
        y = cab_chw(y, params[f'decoder_level2__{i}'], **kw)
    skip1 = cab_chw(enc1, params['skip_attn1'], **kw)
    y = up_skip_chw(y, params['up21'], skip1, interpret=interpret)
    return cab_chw(y, params['decoder_level1__0'], **kw)


def tfr_shapes_ok(h: int, w: int) -> bool:
    """Whether the packed TFR path supports this extent (pf=4 packing and
    at least one dividing row tile at every level)."""
    if h % 4 or w % 4:
        return False
    gh = h // 4
    return any(gh % t == 0 for t in (16, 12, 8, 6, 4, 3, 2))
