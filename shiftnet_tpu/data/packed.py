"""Packed dataset format (.snpk): zero-decode video storage + native reader.

The TPU-native replacement for the reference's LMDB pipeline
(``basicsr/utils/lmdb_util.py``, ``create_lmdb.py``, ``file_client.py`` lmdb
backend): frames are decoded once at pack time and stored raw; training reads
are pure memory-mapped gathers served by the C++ library
(``native/packed_reader.cpp``) through ctypes, with a numpy-memmap fallback
when the native lib isn't built.

Build the native lib with ``make -C native`` (or
``python -m shiftnet_tpu.data.packed --build``).
"""
from __future__ import annotations

import ctypes
import glob
import os
import struct
import subprocess
from typing import Sequence

import numpy as np

MAGIC = 0x534E504B
_HEADER = struct.Struct('<II')
_VIDEO = struct.Struct('<QQQQQ')

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, 'libpackedreader.so'))


def build_native(force: bool = False) -> str | None:
    """Compile the C++ reader if a toolchain is available."""
    src = os.path.join(_NATIVE_DIR, 'packed_reader.cpp')
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
             src, '-o', _LIB_PATH],
            check=True, capture_output=True)
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


def _load_lib():
    if not os.path.exists(_LIB_PATH) and build_native() is None:
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.snpk_open.restype = ctypes.c_void_p
    lib.snpk_open.argtypes = [ctypes.c_char_p]
    lib.snpk_close.argtypes = [ctypes.c_void_p]
    lib.snpk_num_videos.restype = ctypes.c_int64
    lib.snpk_num_videos.argtypes = [ctypes.c_void_p]
    lib.snpk_video_meta.restype = ctypes.c_int
    lib.snpk_video_meta.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int64)]
    i64p = np.ctypeslib.ndpointer(np.int64, flags='C')
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C,WRITEABLE')
    lib.snpk_read_clip_crop.restype = ctypes.c_int
    lib.snpk_read_clip_crop.argtypes = [
        ctypes.c_void_p] + [ctypes.c_int64] * 7 + [u8p]
    lib.snpk_read_batch.restype = ctypes.c_int
    lib.snpk_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, i64p, i64p, i64p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        u8p, ctypes.c_int64]
    return lib


def pack_video_folder(root: str, out_path: str, *,
                      n_frames_per_video: int | None = None) -> None:
    """Pack ``<root>/<video>/*`` image folders into one .snpk file."""
    from shiftnet_tpu.data.video_dataset import _imread

    videos = sorted(glob.glob(os.path.join(root, '*')))
    assert videos, f'no videos under {root}'
    metas = []
    offset = None  # filled after header size known
    frames_per_video = []
    for v in videos:
        frames = sorted(glob.glob(os.path.join(v, '*')))
        if n_frames_per_video:
            frames = frames[:n_frames_per_video]
        img0 = _imread(frames[0])
        h, w, c = img0.shape
        frames_per_video.append(frames)
        metas.append([len(frames), h, w, c, 0])

    header_size = _HEADER.size + 8 + _VIDEO.size * len(metas)
    offset = header_size
    for m in metas:
        m[4] = offset
        offset += m[0] * m[1] * m[2] * m[3]

    with open(out_path, 'wb') as f:
        f.write(_HEADER.pack(MAGIC, 1))
        f.write(struct.pack('<Q', len(metas)))
        for m in metas:
            f.write(_VIDEO.pack(*m))
        for frames, m in zip(frames_per_video, metas):
            for p in frames:
                img = _imread(p)
                assert img.shape == (m[1], m[2], m[3]), (p, img.shape)
                f.write(np.ascontiguousarray(img, np.uint8).tobytes())


class PackedVideoReader:
    """Random-access reader over a .snpk file (native lib or numpy mmap)."""

    def __init__(self, path: str, prefer_native: bool = True):
        self.path = path
        self._lib = _load_lib() if prefer_native else None
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.snpk_open(path.encode())
            if not self._handle:
                self._lib = None
        self.native = self._lib is not None

        # Always parse the header in Python for metadata / fallback.
        with open(path, 'rb') as f:
            magic, version = _HEADER.unpack(f.read(_HEADER.size))
            assert magic == MAGIC and version == 1, (magic, version)
            (n_videos,) = struct.unpack('<Q', f.read(8))
            self.metas = [
                _VIDEO.unpack(f.read(_VIDEO.size)) for _ in range(n_videos)]
        self._mmap = np.memmap(path, np.uint8, 'r')

    def __len__(self):
        return len(self.metas)

    def video_shape(self, video: int) -> tuple[int, int, int, int]:
        n, h, w, c, _ = self.metas[video]
        return n, h, w, c

    def read_clip_crop(self, video: int, frame0: int, n_seq: int,
                       y: int, x: int, ph: int, pw: int) -> np.ndarray:
        n, h, w, c, off = self.metas[video]
        out = np.empty((n_seq, ph, pw, c), np.uint8)
        if self.native:
            rc = self._lib.snpk_read_clip_crop(
                self._handle, video, frame0, n_seq, y, x, ph, pw, out)
            assert rc == 0, rc
            return out
        frames = self._mmap[off:off + n * h * w * c].reshape(n, h, w, c)
        out[...] = frames[frame0:frame0 + n_seq, y:y + ph, x:x + pw]
        return out

    def read_batch(self, videos: Sequence[int], frame0s: Sequence[int],
                   ys: Sequence[int], xs: Sequence[int], n_seq: int,
                   ph: int, pw: int, n_threads: int = 4) -> np.ndarray:
        n = len(videos)
        c = self.metas[videos[0]][3]
        out = np.empty((n, n_seq, ph, pw, c), np.uint8)
        if self.native:
            rc = self._lib.snpk_read_batch(
                self._handle, n,
                np.asarray(videos, np.int64), np.asarray(frame0s, np.int64),
                np.asarray(ys, np.int64), np.asarray(xs, np.int64),
                n_seq, ph, pw, c, out.reshape(-1), n_threads)
            assert rc == 0, rc
            return out
        for i in range(n):
            out[i] = self.read_clip_crop(videos[i], frame0s[i], n_seq,
                                         ys[i], xs[i], ph, pw)
        return out

    def close(self):
        if self.native and self._handle:
            self._lib.snpk_close(self._handle)
            self._handle = None


class PackedVideoDataset:
    """Training dataset over a packed .snpk file (drop-in for
    ``VideoFolderDataset``): flat window index, native random-crop reads,
    flip/rot augmentation.  For paired tasks pass both gt and lq packs."""

    def __init__(self, gt_path: str, lq_path: str | None = None, *,
                 n_seq: int, patch_size: int = 256, size_must_mode: int = 4,
                 augment: bool = True):
        self.gt = PackedVideoReader(gt_path)
        self.lq = PackedVideoReader(lq_path) if lq_path else None
        if self.lq is not None:
            assert len(self.gt) == len(self.lq)
        self.n_seq = n_seq
        self.patch_size = patch_size
        self.size_must_mode = size_must_mode
        self.augment = augment
        self.index = []  # (video, frame0)
        for v in range(len(self.gt)):
            n, h, w, c = self.gt.video_shape(v)
            for f0 in range(n - n_seq + 1):
                self.index.append((v, f0))

    def __len__(self):
        return len(self.index)

    def load(self, idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]:
        v, f0 = self.index[idx]
        n, h, w, c = self.gt.video_shape(v)
        p = self.patch_size - self.patch_size % self.size_must_mode
        iy = int(rng.integers(0, h - self.patch_size + 1))
        ix = int(rng.integers(0, w - self.patch_size + 1))
        gt = self.gt.read_clip_crop(v, f0, self.n_seq, iy, ix, p, p)
        lq = (self.lq.read_clip_crop(v, f0, self.n_seq, iy, ix, p, p)
              if self.lq is not None else None)
        if self.augment:
            hflip, vflip, rot90 = (rng.random() < 0.5 for _ in range(3))

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
        out = {'gt': np.ascontiguousarray(gt, np.float32) / 255.0}
        if lq is not None:
            out['lq'] = np.ascontiguousarray(lq, np.float32) / 255.0
        return out


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--build', action='store_true', help='build native lib')
    ap.add_argument('--pack', nargs=2, metavar=('ROOT', 'OUT'),
                    help='pack <root>/<video>/* into OUT.snpk')
    args = ap.parse_args()
    if args.build:
        print(build_native(force=True) or 'build failed')
    if args.pack:
        pack_video_folder(args.pack[0], args.pack[1])
        print(f'packed {args.pack[0]} -> {args.pack[1]}')
