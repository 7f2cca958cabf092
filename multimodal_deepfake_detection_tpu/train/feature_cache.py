"""Frozen-backbone feature caching for the head-only training phases.

The reference trains ``train_audio`` with the Xception backbone frozen for all
100 epochs (``/root/reference/XceptionLSTMA.py:11-12`` freezes every backbone
param; only the LSTM/MLP head learns), yet its loop re-runs the full backbone
forward on every clip every epoch. With the backbone in eval-BN mode the
per-clip 2048-d features are invariant across epochs, so one batched backbone
pass per distinct batch composition feeds every subsequent epoch — an
order-of-magnitude epoch-time lever for the frozen paths (``train_audio``
end-to-end, the first ``freeze_epochs`` of ``train_visual``).

Fidelity caveat: the reference freezes *params only* — its BatchNorm layers
stay in train mode, so frozen-phase features drift with batch statistics.
Caching is exact only in the eval-BN quality mode (``backbone_bn_eval``) and
the train CLIs require that flag combination; the bit-for-bit reference
behavior remains the uncached default.
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np


class FeatureCachingLoader:
    """Wrap a batch loader, replacing each ``(x, labels, lengths)`` batch with
    ``(features, labels, lengths)``.

    The first epoch runs ``feat_fn`` (a jitted frozen-backbone forward —
    optionally quantized, optionally on an accelerator) once per batch and
    stores the result host-side; later epochs replay from memory with zero
    device compute for the backbone. The wrapped loader must yield a
    deterministic batch sequence (the train CLIs construct their loaders with
    ``shuffle=False``); a shuffling loader would silently freeze its epoch-0
    order, so pass ``allow_shuffle=True`` only when that is intended.

    Memory: ``n_clips * T * 2048 * 4`` bytes host RAM (float32); e.g. 2,000
    clips of 120 MFCC steps ~ 2.0 GB. ``dtype`` can drop this to bfloat16
    storage (features re-cast to the compute dtype downstream anyway).
    """

    def __init__(
        self,
        loader: Iterable,
        feat_fn: Callable[[np.ndarray], np.ndarray],
        *,
        dtype: Optional[np.dtype] = None,
        allow_shuffle: bool = False,
    ):
        if not allow_shuffle and bool(getattr(loader, "shuffle", False)):
            raise ValueError(
                "FeatureCachingLoader would freeze a shuffling loader's epoch-0 "
                "order; construct the loader with shuffle=False (or pass "
                "allow_shuffle=True deliberately)"
            )
        self.loader = loader
        self.feat_fn = feat_fn
        self.dtype = dtype
        self._cache = None

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        if self._cache is None:
            cache = []
            for x, labels, lengths in self.loader:
                feats = np.asarray(self.feat_fn(x))
                if self.dtype is not None:
                    feats = feats.astype(self.dtype)
                cache.append((feats, np.asarray(labels), np.asarray(lengths)))
            self._cache = cache
        for feats, labels, lengths in self._cache:
            yield feats, labels, lengths

    def drop(self) -> None:
        """Release the cached features (e.g. when a CLI unfreezes the
        backbone and switches back to the raw loader)."""
        self._cache = None


class _EpochCounter:
    """Shared epoch position for a train/eval PhaseSwitchLoader pair."""

    def __init__(self):
        self.value = 0


class PhaseSwitchLoader:
    """Cached features while the backbone is frozen, raw batches after.

    The freeze-then-unfreeze recipe (``/root/reference/train_visual.py:543,
    551-556`` — backbone frozen for the first N epochs) makes the backbone
    forward invariant for those N epochs in eval-BN mode; this loader serves
    them from a feature cache and transparently switches to the raw loader at
    the unfreeze epoch, freeing the cache. The consumer's step functions
    dispatch on the batch rank (cached features are (B, T, F); raw frames are
    (B, T, H, W, 3)).

    Epoch tracking: a shared :class:`_EpochCounter` advanced once per
    completed iteration of the ``role='train'`` loader — the convention every
    in-repo loop follows (one train-loader pass per epoch). The ``role='eval'``
    loader reads the counter: after train epoch e the counter is e+1 and the
    backbone is unchanged iff e+1 <= switch_epoch.
    """

    def __init__(self, loader, feat_fn, *, switch_epoch: int, counter: _EpochCounter,
                 role: str = "train"):
        if bool(getattr(loader, "shuffle", False)):
            raise ValueError(
                "PhaseSwitchLoader would freeze a shuffling loader's epoch-0 order "
                "during the cached phase; construct the loader with shuffle=False"
            )
        if role not in ("train", "eval"):
            raise ValueError(role)
        self.loader = loader
        self.feat_fn = feat_fn
        self.switch_epoch = int(switch_epoch)
        self.counter = counter
        self.role = role
        self._cache = None

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return getattr(self.loader, "dataset", None)

    def _cached_batches(self):
        if self._cache is None:
            cache = []
            for x, labels, lengths in self.loader:
                cache.append((np.asarray(self.feat_fn(x)), np.asarray(labels), np.asarray(lengths)))
            self._cache = cache
        return self._cache

    def __iter__(self):
        e = self.counter.value
        frozen = (e < self.switch_epoch) if self.role == "train" else (e <= self.switch_epoch)
        if frozen:
            yield from self._cached_batches()
        else:
            self._cache = None  # unfrozen: free the feature RAM
            yield from self.loader
        if self.role == "train":
            self.counter.value = e + 1
