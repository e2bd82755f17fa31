"""Packed dataset (.snpk) format + native reader tests."""
import os

import numpy as np
import pytest

from shiftnet_tpu.data.packed import (PackedVideoReader, build_native,
                                      pack_video_folder)


@pytest.fixture(scope='module')
def packed(tmp_path_factory):
    root = tmp_path_factory.mktemp('pack_src')
    import imageio.v2 as imageio
    rng = np.random.default_rng(3)
    truth = {}
    for v in ('a', 'b'):
        d = root / v
        d.mkdir()
        frames = rng.integers(0, 255, (6, 24, 32, 3), dtype=np.uint8)
        truth[v] = frames
        for i, fimg in enumerate(frames):
            imageio.imwrite(str(d / f'{i:03d}.png'), fimg)
    out = str(tmp_path_factory.mktemp('pack_out') / 'ds.snpk')
    pack_video_folder(str(root), out)
    return out, truth


def test_pack_and_read_fallback(packed):
    path, truth = packed
    r = PackedVideoReader(path, prefer_native=False)
    assert len(r) == 2
    assert r.video_shape(0) == (6, 24, 32, 3)
    clip = r.read_clip_crop(0, 1, 3, 4, 6, 16, 16)
    np.testing.assert_array_equal(clip, truth['a'][1:4, 4:20, 6:22])


def test_native_reader_matches_fallback(packed):
    path, truth = packed
    if build_native() is None:
        pytest.skip('no C++ toolchain')
    r = PackedVideoReader(path, prefer_native=True)
    assert r.native, 'native lib failed to load'
    clip = r.read_clip_crop(1, 0, 4, 2, 3, 20, 24)
    np.testing.assert_array_equal(clip, truth['b'][0:4, 2:22, 3:27])

    batch = r.read_batch([0, 1, 0], [0, 2, 1], [0, 4, 8], [0, 2, 1],
                         n_seq=2, ph=12, pw=12, n_threads=3)
    np.testing.assert_array_equal(batch[0], truth['a'][0:2, 0:12, 0:12])
    np.testing.assert_array_equal(batch[1], truth['b'][2:4, 4:16, 2:14])
    np.testing.assert_array_equal(batch[2], truth['a'][1:3, 8:20, 1:13])
    r.close()


def test_native_bounds_check(packed):
    path, _ = packed
    if build_native() is None:
        pytest.skip('no C++ toolchain')
    r = PackedVideoReader(path, prefer_native=True)
    if not r.native:
        pytest.skip('native lib missing')
    with pytest.raises(AssertionError):
        r.read_clip_crop(0, 5, 3, 0, 0, 8, 8)  # frame overrun
    with pytest.raises(AssertionError):
        r.read_clip_crop(0, 0, 1, 20, 30, 8, 8)  # crop overrun
    r.close()
