"""Threaded prefetching batch loader.

Replaces the reference's worker-process DataLoader + ``PrefetchGenerator`` /
``CPUPrefetcher`` stack (``basicsr/data/prefetch_dataloader.py``): background
threads decode and batch clips into a bounded queue so the accelerator never
waits on image IO.  Thread-based (not process) because decode is
PIL/zlib-bound and releases the GIL.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from shiftnet_tpu.data.video_dataset import ShardedEpochSampler, VideoFolderDataset


class PrefetchLoader:
    """Iterates epochs forever, yielding batched sample dicts.

    Each batch value has shape ``(batch, T, H, W, C)``.  Per-sample RNG is
    derived from (seed, epoch, index) so runs are reproducible regardless of
    thread scheduling.
    """

    def __init__(self, dataset: VideoFolderDataset, sampler: ShardedEpochSampler,
                 *, batch_size: int = 1, num_threads: int = 2,
                 queue_depth: int = 4, seed: int = 0, start_batch: int = 0):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_threads = max(1, num_threads)
        self.queue_depth = queue_depth
        self.seed = seed
        # Resume support: skip the first `start_batch` global batches by
        # index arithmetic (no decode) so a resumed run sees exactly the
        # batch stream the uninterrupted run would — bitwise-reproducible
        # training across preemptions (the per-sample RNG is (seed, epoch,
        # idx)-keyed, so skipping is exact).  May be set any time before the
        # first ``__iter__``.
        self.start_batch = int(start_batch)
        self._stop = threading.Event()
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._started = False

    def _sample(self, epoch: int, idx: int) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, int(idx)]))
        return self.dataset.load(int(idx), rng)

    def _producer(self):
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(self.num_threads) as pool:
            epoch = 0
            gb = 0  # global batch counter (for start_batch skipping)
            while not self._stop.is_set():
                indices = self.sampler.epoch_indices(epoch)
                nb = len(indices) // self.batch_size
                if gb + nb <= self.start_batch:  # whole epoch already consumed
                    gb += nb
                    epoch += 1
                    continue
                for b in range(nb):
                    if gb < self.start_batch:
                        gb += 1
                        continue
                    gb += 1
                    chunk = indices[b * self.batch_size:(b + 1) * self.batch_size]
                    samples = list(pool.map(
                        lambda i: self._sample(epoch, i), chunk))
                    batch = {k: np.stack([s[k] for s in samples])
                             for k in samples[0]}
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=1.0)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
                epoch += 1

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        if not self._started:
            self._thread.start()
            self._started = True
        # Poll with a timeout so a concurrent stop() can never leave the
        # consumer blocked on an empty queue after the producer exits.
        while not self._stop.is_set():
            try:
                yield self._q.get(timeout=1.0)
            except queue.Empty:
                continue

    def stop(self):
        self._stop.set()
