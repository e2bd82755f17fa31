"""Grouped spatial-temporal shift (GSTS) ops — the core primitive of GShiftNet.

TPU-native design notes
-----------------------
All ops operate on frames-as-batch NHWC tensors ``(T, H, W, C)`` (the reference
uses NCHW with frames on the batch axis; NHWC is the native TPU conv layout).

The *temporal shift* in the reference is a ``torch.roll`` over the flattened
``(T*C)`` axis (reference ``basicsr/models/archs/gshift_deblur1.py:504-528``).
Crucially this both moves half the channels one frame forward/backward *and*
rotates the channel order within each frame:

  forward : y[t] = concat(x[t-1][C/2:], x[t][:C/2])   (frame 0 wraps to x[T-1])
  reverse : y[t] = concat(x[t][C/2:],   x[t+1][:C/2]) (frame T-1 wraps to x[0])

The big variants then patch the boundary frame back to its unshifted value
(``:513``/``:517``); the small deblur variant (``gshift_deblur2.py:496-512``)
keeps the pure circular roll.  Both behaviors are supported via
``boundary_patch``.

The *grouped spatial shift* (``gshift_deblur1.py:470-503``) splits the first
``8*number`` channels of the shifted tensor into 24 direction groups, each
translated by a static (dy, dx) in {±8, ±4, 0} with zero fill.  Static shifts
mean this compiles to pure slices of a single padded tensor — XLA fuses the
whole thing into the consumer's first conv; no gather is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 24 direction groups: (dy, dx) with out[y, x] = in[y - dy, x - dx], zero fill.
# First 16 groups have n2 = (number-1)//2 channels each, last 8 have
# n1 = number - 2*n2 channels each (reference gshift_deblur1.py:470-503).
SHIFT_DIRS_OUTER = (
    (8, 8), (8, 4), (8, 0), (8, -4), (8, -8),
    (-8, 8), (-8, 4), (-8, 0), (-8, -4), (-8, -8),
    (4, 8), (4, -8), (0, 8), (0, -8), (-4, 8), (-4, -8),
)
SHIFT_DIRS_INNER = (
    (4, 4), (4, 0), (4, -4), (0, 4), (0, -4), (-4, 4), (-4, 0), (-4, -4),
)
MAX_SHIFT = 8


def shift_group_channels(number: int) -> tuple[int, int]:
    """Channel count per (outer, inner) direction group for a given ``number``."""
    n2 = (number - 1) // 2
    n1 = number - 2 * n2
    return n2, n1


def shift_dir_table(number: int) -> list[tuple[int, int, int, int]]:
    """Static (c_start, c_size, dy, dx) table covering all ``8*number`` channels."""
    n2, n1 = shift_group_channels(number)
    table = []
    c = 0
    for dy, dx in SHIFT_DIRS_OUTER:
        table.append((c, n2, dy, dx))
        c += n2
    for dy, dx in SHIFT_DIRS_INNER:
        table.append((c, n1, dy, dx))
        c += n1
    assert c == 8 * number
    return table


def grouped_spatial_shift(hw: jax.Array, number: int) -> jax.Array:
    """24-direction grouped spatial shift with zero fill.

    Parity with reference ``Encoder_shift_block.spatial_shift2``
    (``gshift_deblur1.py:470-503``).

    Args:
      hw: ``(T, H, W, 8*number)`` feature tensor.
      number: group-size parameter (``n_feat // 2 // 8``).

    Returns:
      Same-shape tensor where each channel group is translated by its static
      (dy, dx) offset, zero-filled at the borders.
    """
    t, h, w, c = hw.shape
    assert c == 8 * number, (c, number)
    s = MAX_SHIFT
    padded = jnp.pad(hw, ((0, 0), (s, s), (s, s), (0, 0)))
    # Accumulate full-channel-width shifted slices gated by per-group channel
    # masks.  Never slice skinny channel groups directly: a (T, H, W, 1..2)
    # tensor gets 64x lane-padding blowup in TPU layouts (observed: 886 MB of
    # padding on a 14 MB slice at 720p); full-width slices fuse into a single
    # loop fusion with no padding waste.
    out = None
    for c0, csz, dy, dx in shift_dir_table(number):
        if csz == 0:
            continue
        sl = jax.lax.slice(
            padded, (0, s - dy, s - dx, 0), (t, s - dy + h, s - dx + w, c))
        mask = jnp.zeros((c,), hw.dtype).at[c0:c0 + csz].set(1)
        term = sl * mask
        out = term if out is None else out + term
    return out


def temporal_channel_shift(
    x: jax.Array,
    *,
    reverse: bool = False,
    boundary_patch: bool = True,
    div: int = 2,
    axis: str | None = None,
) -> jax.Array:
    """Temporal half-channel shift over the frame axis.

    Parity with reference ``Encoder_shift_block.channel_shift``'s roll step
    (``gshift_deblur1.py:504-519``; pure-roll small variant
    ``gshift_deblur2.py:496-512``).

    Args:
      x: ``(T, H, W, C)``.
      reverse: shift from the *next* frame instead of the previous one.
      boundary_patch: replace the wrapped boundary frame with its unshifted
        input (big variants + small denoise); ``False`` keeps the circular
        roll (small deblur).
      div: channel split divisor (always 2 in the reference).
      axis: mesh axis name when the frame axis is sharded (``shard_map``
        over a 'time' mesh axis).  The one-frame cross-shard movement
        becomes a ``ppermute`` of a single edge frame's half-channels —
        exact (not halo-approximate) sequence parallelism; differentiable
        (the transpose is the reverse ppermute).

    Returns:
      ``(T, H, W, C)`` tensor: forward => ``y[t] = [x[t-1][C/s:], x[t][:C/s]]``,
      reverse => ``y[t] = [x[t][C/s:], x[t+1][:C/s]]`` (s = div).
    """
    c = x.shape[-1]
    cs = c // div
    if axis is not None:
        return _temporal_channel_shift_sharded(
            x, cs, reverse=reverse, boundary_patch=boundary_patch, axis=axis)
    if not reverse:
        # y[t] = [x[t-1][c-cs:], x[t][:c-cs]]
        y = jnp.concatenate(
            [jnp.roll(x[..., c - cs:], 1, axis=0), x[..., : c - cs]], axis=-1
        )
        if boundary_patch:
            y = jnp.concatenate([x[0:1], y[1:]], axis=0)
    else:
        # y[t] = [x[t][cs:], x[t+1][:cs]]
        y = jnp.concatenate(
            [x[..., cs:], jnp.roll(x[..., :cs], -1, axis=0)], axis=-1
        )
        if boundary_patch:
            y = jnp.concatenate([y[:-1], x[-1:]], axis=0)
    return y


def _temporal_channel_shift_sharded(x, cs: int, *, reverse: bool,
                                    boundary_patch: bool, axis: str):
    """Frame-axis-sharded temporal shift (inside ``shard_map``): exchange one
    edge frame's shifted half-channels with the neighbor shard via
    ``ppermute``, then patch the global boundary frame (shard 0 / n-1 only).

    Bit-identical to the unsharded path on the gathered result: the circular
    ppermute wrap reproduces ``jnp.roll``'s wraparound, and ``boundary_patch``
    overwrites the wrapped frame exactly as ``gshift_deblur1.py:513/:517``.
    """
    c = x.shape[-1]
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    if not reverse:
        # y[t] = [x[t-1][c-cs:], x[t][:c-cs]]; shard needs left neighbor's
        # last frame.
        h = x[..., c - cs:]
        recv = jax.lax.ppermute(
            h[-1:], axis, [(i, (i + 1) % n) for i in range(n)])
        h_prev = jnp.concatenate([recv, h[:-1]], axis=0)
        y = jnp.concatenate([h_prev, x[..., : c - cs]], axis=-1)
        if boundary_patch:
            first = jnp.where(idx == 0, x[:1], y[:1])
            y = jnp.concatenate([first, y[1:]], axis=0)
    else:
        # y[t] = [x[t][cs:], x[t+1][:cs]]; shard needs right neighbor's
        # first frame.
        h = x[..., :cs]
        recv = jax.lax.ppermute(
            h[:1], axis, [(i, (i - 1) % n) for i in range(n)])
        h_next = jnp.concatenate([h[1:], recv], axis=0)
        y = jnp.concatenate([x[..., cs:], h_next], axis=-1)
        if boundary_patch:
            last = jnp.where(idx == n - 1, x[-1:], y[-1:])
            y = jnp.concatenate([y[:-1], last], axis=0)
    return y


def gsts(
    x: jax.Array,
    number: int,
    *,
    reverse: bool = False,
    boundary_patch: bool = True,
    axis: str | None = None,
) -> jax.Array:
    """Full grouped spatial-temporal shift: temporal roll + grouped spatial
    shift of the temporally-moved half, concatenated to the output.

    Parity with reference ``Encoder_shift_block.channel_shift``
    (``gshift_deblur1.py:504-528``): returns ``(T, H, W, C + 8*number)`` where
    the extra channels are the spatially-shifted copy of the ``8*number``
    temporally-shifted channels (front ``8*number`` for forward, back for
    reverse).
    """
    y = temporal_channel_shift(x, reverse=reverse,
                               boundary_patch=boundary_patch, axis=axis)
    if not reverse:
        hw = y[..., : 8 * number]
    else:
        hw = y[..., -8 * number:]
    hw = grouped_spatial_shift(hw, number)
    return jnp.concatenate([y, hw], axis=-1)


@functools.partial(jax.jit, static_argnums=(1,))
def gsts_reference(x: jax.Array, number: int) -> jax.Array:
    """Jitted forward-direction gsts, for tests/benchmarks."""
    return gsts(x, number)
