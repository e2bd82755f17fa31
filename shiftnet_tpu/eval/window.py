"""Windowed / tiled inference planning, matching the reference protocols.

- Deblur (``inference/test_deblur.py:111-120``): chunks of ``one_len`` frames
  with ``begin=end=2`` halo input frames; outputs cover frames
  ``[2, 2 + k_len*one_len)``; leftover tail frames beyond the last full chunk
  are dropped (reference behavior).
- Denoise (``inference/test_denoise.py:115-133``): ``one_len = T-4``, halved
  if >100; the last chunk absorbs the residual frames.
- Spatial quadrant tiling (``inference/test_denoise.py:153-173``): 4 tiles of
  ``(H/2 + pad_h, W/2 + pad_w)`` with ``pad = 32 - (dim/2 % 16)`` overlap,
  center crops stitched back.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Chunk:
    in_start: int   # first input frame index
    in_stop: int    # one past last input frame
    out_start: int  # first predicted (global) frame index
    out_stop: int


def plan_deblur_chunks(n_frames: int, one_len: int, halo: int = 2) -> list[Chunk]:
    k_len = (n_frames - 2 * halo) // one_len
    chunks = []
    for k in range(k_len):
        s = k * one_len
        chunks.append(Chunk(s, s + one_len + 2 * halo,
                            s + halo, s + halo + one_len))
    return chunks


def plan_denoise_chunks(n_frames: int, halo: int = 2) -> list[Chunk]:
    one_len = n_frames - 2 * halo
    if one_len > 100:
        one_len //= 2
    k_len = (n_frames - 2 * halo) // one_len
    residual = (n_frames - 2 * halo) % one_len
    chunks = []
    for k in range(k_len):
        s = k * one_len
        extra = residual if k == k_len - 1 else 0
        chunks.append(Chunk(s, s + one_len + extra + 2 * halo,
                            s + halo, s + halo + one_len + extra))
    return chunks


def quadrant_pads(h: int, w: int) -> tuple[int, int]:
    """Overlap pads: tiles are (h/2+pad_h, w/2+pad_w), 16-px aligned."""
    return 32 - (h // 2 % 16), 32 - (w // 2 % 16)


def quadrant_slices(h: int, w: int):
    """[(input_slice, tile_crop, output_slice)] x 4, reference stitch rules."""
    ph, pw = quadrant_pads(h, w)
    H2, W2 = h // 2, w // 2
    return [
        ((slice(0, H2 + ph), slice(0, W2 + pw)),
         (slice(0, -ph), slice(0, -pw)), (slice(0, H2), slice(0, W2))),
        ((slice(0, H2 + ph), slice(W2 - pw, w)),
         (slice(0, -ph), slice(pw, None)), (slice(0, H2), slice(W2, w))),
        ((slice(H2 - ph, h), slice(0, W2 + pw)),
         (slice(ph, None), slice(0, -pw)), (slice(H2, h), slice(0, W2))),
        ((slice(H2 - ph, h), slice(W2 - pw, w)),
         (slice(ph, None), slice(pw, None)), (slice(H2, h), slice(W2, w))),
    ]


def half_slices(h: int, w: int):
    """Two full-width half-height tiles with 16-px-aligned overlap (same pad
    rule as the quadrants) — fewer, larger launches when HBM allows."""
    ph = 32 - (h // 2 % 16)
    H2 = h // 2
    return [
        ((slice(0, H2 + ph), slice(0, w)),
         (slice(0, -ph), slice(0, w)), (slice(0, H2), slice(0, w))),
        ((slice(H2 - ph, h), slice(0, w)),
         (slice(ph, None), slice(0, w)), (slice(H2, h), slice(0, w))),
    ]


def mod_crop(img: np.ndarray, mode: int = 4) -> np.ndarray:
    """Crop H,W down to multiples of ``mode`` (``test_deblur.py:125-127``)."""
    h, w = img.shape[-3], img.shape[-2]
    return img[..., :h - h % mode, :w - w % mode, :]
