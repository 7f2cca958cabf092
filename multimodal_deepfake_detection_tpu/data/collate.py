"""Padded batching with static-shape buckets.

The reference zero-pads each batch to its own max length
(``/root/reference/video_dataloader.py:53-67``) — fine under eager torch,
but per-batch dynamic shapes would force one XLA recompile per distinct
length. Here lengths are rounded up to a bucket boundary so the jitted step
sees a small, fixed set of shapes, and a ``lengths`` vector rides along so
quality-mode models can mask the padding (the parity-mode LSTM deliberately
consumes it, see ``ops/lstm.select_last_step``).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def bucket_length(t: int, buckets: Optional[Sequence[int]]) -> int:
    """Smallest bucket >= t; falls back to t if buckets is None/exhausted."""
    if not buckets:
        return t
    for b in buckets:
        if t <= b:
            return b
    return buckets[-1]


def pad_collate(
    items: Sequence[Tuple[np.ndarray, int]],
    *,
    buckets: Optional[Sequence[int]] = None,
    batch_size: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-pad a list of (seq_array, label) to a common bucketed length.

    Returns (batch (B, T, ...), labels (B,) float32, lengths (B,) int32).
    Sequences longer than the largest bucket are truncated to it. When
    ``batch_size`` is given, a short final batch is zero-padded up to it with
    ``lengths == 0`` rows (so jitted steps see one static batch shape; losses
    mask the rows via sample weights and the loop drops them from metrics).
    """
    max_t = max(x.shape[0] for x, _ in items)
    T = bucket_length(max_t, buckets)
    B = batch_size if batch_size is not None else len(items)
    tail = items[0][0].shape[1:]
    batch = np.zeros((B, T) + tuple(tail), np.float32)
    lengths = np.zeros((B,), np.int32)
    labels = np.zeros((B,), np.float32)
    for i, (x, y) in enumerate(items):
        t = min(x.shape[0], T)
        batch[i, :t] = x[:t]
        lengths[i] = t
        labels[i] = y
    return batch, labels, lengths
