"""Minimal, deterministic data loader with weighted sampling and prefetch.

Replaces torch ``DataLoader`` + ``WeightedRandomSampler``
(``/root/reference/train_au_face.py:521-541``). Batches are plain numpy; the
train loop device-puts them (and on multi-chip, shards them) — keeping host
work independent from the jitted step so it overlaps with device compute via
a small background-thread prefetch queue.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from .collate import pad_collate


def make_weighted_sampler(labels: Sequence[int], rng: np.random.Generator, num_samples: Optional[int] = None):
    """Class-balanced with-replacement index sampler.

    Weights are 0.5/count(class) per sample — the reference's construction
    (``/root/reference/train_au_face.py:533-539``).
    """
    labels = np.asarray(labels)
    counts = np.bincount(labels, minlength=2)
    w = np.where(labels == 1, 0.5 / max(counts[1], 1), 0.5 / max(counts[0], 1)).astype(np.float64)
    w = w / w.sum()
    n = num_samples or len(labels)

    def sample() -> np.ndarray:
        return rng.choice(len(labels), size=n, replace=True, p=w)

    return sample


class DataLoader:
    """Iterates a dataset in padded batches.

    Args:
        dataset: indexable with ``__len__`` returning (array, label) items.
        batch_size: items per batch (last partial batch is kept).
        shuffle: reshuffle indices each epoch with the given seed sequence.
        weighted: class-balanced with-replacement sampling per epoch.
        buckets: static pad-length buckets (see collate.pad_collate).
        collate: override the collate fn (signature of pad_collate).
        prefetch: number of batches prepared ahead on a background thread.
        item_workers: when > 0, load a batch's items concurrently on a
            thread pool of that size (decode fan-out). The hot item loads —
            cv2/native video decode, npy reads, resize — release the GIL, so
            this scales with host cores where the per-item decode is the
            bottleneck (raw-video training: the H.264 codec is ~97% of the
            item cost, PERF.md "native H.264 decode finding"; fan-out across
            clips is the lever that parallelizes a codec-bound pipeline).
            Order within a batch is preserved — batches are bit-identical to
            item_workers=0.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        *,
        shuffle: bool = False,
        weighted: bool = False,
        seed: int = 0,
        buckets: Optional[Sequence[int]] = None,
        collate: Optional[Callable] = None,
        drop_last: bool = False,
        prefetch: int = 2,
        pad_batch: bool = True,
        item_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.weighted = weighted
        self.buckets = buckets
        self.collate = collate or (
            lambda items: pad_collate(
                items, buckets=buckets, batch_size=batch_size if pad_batch else None
            )
        )
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.item_workers = int(item_workers)
        self._pool = None  # created lazily, shared across epochs
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def _load_items(self, chunk: np.ndarray) -> list:
        if self.item_workers <= 0 or len(chunk) <= 1:
            return [self.dataset[int(i)] for i in chunk]
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.item_workers, thread_name_prefix="item-loader"
            )
        # map preserves submission order: batches match item_workers=0 exactly
        return list(self._pool.map(lambda i: self.dataset[int(i)], chunk))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.weighted:
            labels = getattr(self.dataset, "all_labels")
            return make_weighted_sampler(labels, self._rng)()
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _batches(self) -> Iterator:
        idx = self._epoch_indices()
        self._epoch += 1
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield self.collate(self._load_items(chunk))

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is _SENTINEL:
                break
            yield b
        t.join()
