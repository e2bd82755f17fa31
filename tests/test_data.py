"""Data pipeline tests on a synthetic on-disk video folder."""
import os

import numpy as np
import pytest

from shiftnet_tpu.data.loader import PrefetchLoader
from shiftnet_tpu.data.video_dataset import (ShardedEpochSampler,
                                             VideoFolderDataset)


@pytest.fixture(scope='module')
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('videos')
    import imageio.v2 as imageio
    rng = np.random.default_rng(0)
    for sub in ('gt', 'blur'):
        for v in ('vid_a', 'vid_b'):
            d = root / sub / v
            d.mkdir(parents=True)
            for i in range(9):
                img = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
                imageio.imwrite(str(d / f'{i:03d}.png'), img)
    return str(root)


def test_window_index(video_root):
    ds = VideoFolderDataset(video_root, n_seq=5, patch_size=32)
    # 2 videos x (9 - 5 + 1) windows
    assert len(ds) == 10
    s = ds.load(0, np.random.default_rng(0))
    assert s['gt'].shape == (5, 32, 32, 3)
    assert s['lq'].shape == (5, 32, 32, 3)
    assert s['gt'].dtype == np.float32
    assert 0.0 <= s['gt'].min() and s['gt'].max() <= 1.0


def test_crop_is_joint(video_root):
    """lq/gt crops must come from the same location (paired supervision)."""
    ds = VideoFolderDataset(video_root, n_seq=3, patch_size=16, augment=False)
    # gt and blur trees hold *different* random images here, but the crop
    # offsets must match: reload full frames and verify subwindow equality.
    rec = ds.records[4]
    s = ds.load(4, np.random.default_rng(7))
    from shiftnet_tpu.data.video_dataset import _imread
    full_gt = np.stack([_imread(p) for p in rec.gt_paths]).astype(np.float32) / 255
    # find the gt crop offset, then check lq matches at the same offset
    found = False
    p = 16
    for iy in range(full_gt.shape[1] - p + 1):
        for ix in range(full_gt.shape[2] - p + 1):
            if np.array_equal(full_gt[:, iy:iy + p, ix:ix + p], s['gt']):
                full_lq = np.stack([_imread(q) for q in rec.lq_paths]
                                   ).astype(np.float32) / 255
                np.testing.assert_array_equal(
                    full_lq[:, iy:iy + p, ix:ix + p], s['lq'])
                found = True
    assert found


def test_sampler_shards_partition():
    s0 = ShardedEpochSampler(10, num_shards=2, shard=0, seed=1)
    s1 = ShardedEpochSampler(10, num_shards=2, shard=1, seed=1)
    i0, i1 = s0.epoch_indices(3), s1.epoch_indices(3)
    assert len(i0) == len(i1) == 5
    assert sorted(np.concatenate([i0, i1]) % 10) == sorted(
        np.random.default_rng(1 + 3).permutation(10) % 10)
    # different epochs reshuffle
    assert not np.array_equal(s0.epoch_indices(3), s0.epoch_indices(4))


def test_sampler_enlarge_ratio():
    """dataset_enlarge_ratio (reference data_sampler.py:22-50): the epoch
    index space is ratio-enlarged mod dataset size, so each epoch visits
    every sample ~ratio times."""
    s = ShardedEpochSampler(10, ratio=3, num_shards=1, shard=0, seed=0)
    idx = s.epoch_indices(0)
    assert len(idx) == 30
    counts = np.bincount(idx, minlength=10)
    assert counts.sum() == 30 and (counts == 3).all()


def test_loader_start_batch_skips_exactly(video_root):
    """Resume fast-forward: start_batch=k reproduces the uninterrupted
    stream's batches k, k+1, ... bitwise (index arithmetic, no decode)."""
    ds = VideoFolderDataset(video_root, n_seq=3, patch_size=16)

    def batches(start, n):
        loader = PrefetchLoader(ds, ShardedEpochSampler(len(ds), seed=5),
                                batch_size=2, seed=5, start_batch=start)
        it = iter(loader)
        out = [next(it) for _ in range(n)]
        loader.stop()
        return out

    full = batches(0, 5)
    resumed = batches(3, 2)
    for a, b in zip(full[3:], resumed):
        np.testing.assert_array_equal(a['gt'], b['gt'])
        np.testing.assert_array_equal(a['lq'], b['lq'])


def test_prefetch_loader_batches(video_root):
    ds = VideoFolderDataset(video_root, n_seq=3, patch_size=16)
    sampler = ShardedEpochSampler(len(ds))
    loader = PrefetchLoader(ds, sampler, batch_size=2, num_threads=2)
    it = iter(loader)
    batches = [next(it) for _ in range(3)]
    loader.stop()
    for b in batches:
        assert b['gt'].shape == (2, 3, 16, 16, 3)
        assert b['lq'].shape == (2, 3, 16, 16, 3)


def test_loader_deterministic(video_root):
    ds = VideoFolderDataset(video_root, n_seq=3, patch_size=16)
    def first_batch():
        loader = PrefetchLoader(ds, ShardedEpochSampler(len(ds), seed=5),
                                batch_size=2, seed=5)
        it = iter(loader)
        b = next(it)
        loader.stop()
        return b
    b1, b2 = first_batch(), first_batch()
    np.testing.assert_array_equal(b1['gt'], b2['gt'])
    np.testing.assert_array_equal(b1['lq'], b2['lq'])


def test_staged_batches_order_and_lookahead():
    """The trainer's 1-deep H2D prefetch must yield every batch exactly once,
    in order, and stage batch N+1 before batch N is consumed."""
    from shiftnet_tpu.train.trainer import staged_batches

    staged_log = []
    batches = [{'x': i} for i in range(5)]

    def put(b):
        staged_log.append(b['x'])
        return {'x': b['x'] * 10}

    seen = []
    for host, dev in staged_batches(iter(batches), put):
        # when batch N is yielded, N+1 (if any) has already been staged
        assert staged_log[:len(seen) + 2] == list(
            range(min(len(seen) + 2, 5)))
        assert dev == {'x': host['x'] * 10}
        seen.append(host['x'])
    assert seen == [0, 1, 2, 3, 4]
    assert staged_log == [0, 1, 2, 3, 4]


def test_staged_batches_empty():
    from shiftnet_tpu.train.trainer import staged_batches
    assert list(staged_batches(iter([]), lambda b: b)) == []
