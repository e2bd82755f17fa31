"""Video clip datasets over frame folders, NHWC numpy.

Replaces the reference's ``VideoImageDataset`` /  ``VideoImage2Dataset``
(``basicsr/data/video_image_dataset.py``, ``video_image2_dataset.py``): a flat
index over all length-``n_seq`` windows of every video
(``video_image_dataset.py:119-147``), joint random crop, mod-crop, and 8-way
flip/rot augmentation (``basicsr/data/data_util.py:19-67``).

Torch-free: plain numpy arrays, loading via imageio (PIL backend).  Datasets
are indexable and stateless; randomness comes from a caller-supplied
``np.random.Generator`` so epochs are reproducible and shardable.
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Sequence

import numpy as np


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    img = imageio.imread(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3]


@dataclasses.dataclass
class ClipRecord:
    lq_paths: tuple[str, ...] | None
    gt_paths: tuple[str, ...]
    video: str
    frame0: int


class VideoFolderDataset:
    """Flat window index over ``<root>/<gt_dir>/<video>/*`` (+ optional
    ``<lq_dir>``) frame folders."""

    def __init__(self, root: str, n_seq: int, *, gt_dir: str = 'gt',
                 lq_dir: str | None = 'blur', patch_size: int = 256,
                 size_must_mode: int = 4, augment: bool = True,
                 n_frames_per_video: int | None = None):
        self.n_seq = n_seq
        self.patch_size = patch_size
        self.size_must_mode = size_must_mode
        self.augment = augment
        gt_videos = sorted(glob.glob(os.path.join(root, gt_dir, '*')))
        if not gt_videos:
            raise FileNotFoundError(f'no videos under {root}/{gt_dir}')
        lq_videos = (sorted(glob.glob(os.path.join(root, lq_dir, '*')))
                     if lq_dir else [None] * len(gt_videos))
        if lq_dir:
            assert len(gt_videos) == len(lq_videos), (root, gt_dir, lq_dir)
        self.records: list[ClipRecord] = []
        for gv, lv in zip(gt_videos, lq_videos):
            gt_frames = sorted(glob.glob(os.path.join(gv, '*')))
            if n_frames_per_video:
                gt_frames = gt_frames[:n_frames_per_video]
            lq_frames = None
            if lv is not None:
                lq_frames = sorted(glob.glob(os.path.join(lv, '*')))
                if n_frames_per_video:
                    lq_frames = lq_frames[:n_frames_per_video]
                assert len(lq_frames) == len(gt_frames), (gv, lv)
            name = os.path.basename(gv)
            for f0 in range(len(gt_frames) - n_seq + 1):
                self.records.append(ClipRecord(
                    tuple(lq_frames[f0:f0 + n_seq]) if lq_frames else None,
                    tuple(gt_frames[f0:f0 + n_seq]), name, f0))

    def __len__(self) -> int:
        return len(self.records)

    def load(self, idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]:
        """Load one training sample: random-crop + augmented clip windows.

        Returns {'lq': (T,p,p,3) float32 in [0,1] or absent, 'gt': ...}.
        """
        rec = self.records[idx]
        gt = np.stack([_imread(p) for p in rec.gt_paths])  # (T, H, W, 3) uint8
        lq = (np.stack([_imread(p) for p in rec.lq_paths])
              if rec.lq_paths else None)

        t, h, w, _ = gt.shape
        p = self.patch_size
        iy = int(rng.integers(0, h - p + 1))
        ix = int(rng.integers(0, w - p + 1))
        gt = gt[:, iy:iy + p, ix:ix + p]
        if lq is not None:
            lq = lq[:, iy:iy + p, ix:ix + p]
        m = self.size_must_mode
        ph, pw = p - p % m, p - p % m
        gt = gt[:, :ph, :pw]
        if lq is not None:
            lq = lq[:, :ph, :pw]

        if self.augment:
            hflip = rng.random() < 0.5
            vflip = rng.random() < 0.5
            rot90 = rng.random() < 0.5

            def aug(img):
                if hflip:
                    img = img[:, :, ::-1]
                if vflip:
                    img = img[:, ::-1]
                if rot90:
                    img = np.rot90(img, axes=(1, 2))
                return img

            gt = aug(gt)
            if lq is not None:
                lq = aug(lq)

        out = {'gt': np.ascontiguousarray(gt, dtype=np.float32) / 255.0}
        if lq is not None:
            out['lq'] = np.ascontiguousarray(lq, dtype=np.float32) / 255.0
        return out


class ShardedEpochSampler:
    """Epoch-seeded shuffled index stream with per-host sharding.

    Replaces ``EnlargedSampler`` (``basicsr/data/data_sampler.py:37-50``):
    permutation of a ``ratio``-enlarged index space mod dataset size, strided
    by host.
    """

    def __init__(self, n: int, *, ratio: int = 1, num_shards: int = 1,
                 shard: int = 0, seed: int = 0):
        self.n = n
        self.num_samples = -(-n * ratio // num_shards)
        self.total = self.num_samples * num_shards
        self.num_shards = num_shards
        self.shard = shard
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        idx = rng.permutation(self.total) % self.n
        return idx[self.shard::self.num_shards]
