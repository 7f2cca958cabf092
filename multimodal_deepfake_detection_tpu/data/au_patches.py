"""AU-patch and joint face+AU datasets (phantom D6 / D3 loaders).

Reconstructions of the absent ``Dataset.AUPatchFeatureLoader.
get_patch_image_loaders`` and ``Dataset.AuVidDataset.get_joint_dataloader``,
to the contracts pinned by their call sites (SURVEY.md §2.3):

* patch loaders return (train, test, eval) and yield
  ``(patches (B,T,A,C,H,W-analog), au_weights (B,T,A), labels)`` with
  augment_train/eval/test balancing flags
  (``/root/reference/train_au_patch.py:186-196``);
* the joint loader returns (train, test, eval), yields
  ``(videos, au_patches, labels[, au_mask, au_weight])`` under
  ``return_weights``, and exposes ``dataset.all_labels``
  (``train_au_face.py:563-574,509-518``).

On-disk contract (produced by the synthetic generators and the preprocessing
CLIs): ``{root}/{split}/{label}_{id}.npy`` patch stacks (T, A, h, w, 3) uint8
with sibling ``{label}_{id}_weights.npy`` (T, A) float32; the joint dataset
pairs them with face npys of the same stem under ``video_root``.

All arrays stay NHWC (TPU layout); time and AU axes are zero-padded to
static buckets with an ``au_mask`` marking real patches.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .collate import bucket_length
from .datasets import label_from_filename
from .loader import DataLoader


def _list_stems(folder: str) -> List[str]:
    return sorted(
        f[:-4]
        for f in os.listdir(folder)
        if f.endswith(".npy") and not f.endswith("_weights.npy")
    )


def _balance_oversample(stems: List[str], labels: List[int], rng: np.random.Generator):
    idx0 = [i for i, l in enumerate(labels) if l == 0]
    idx1 = [i for i, l in enumerate(labels) if l == 1]
    if not idx0 or not idx1:
        return stems, labels
    minority, majority = (idx0, idx1) if len(idx0) < len(idx1) else (idx1, idx0)
    extra = rng.choice(minority, size=len(majority) - len(minority), replace=True)
    order = list(range(len(stems))) + [int(i) for i in extra]
    return [stems[i] for i in order], [labels[i] for i in order]


def _augment(arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Light spatial/photometric augmentation (flip + brightness jitter)."""
    if rng.random() < 0.5:
        arr = arr[..., ::-1, :]  # horizontal flip (W axis)
    if rng.random() < 0.5:
        arr = np.clip(arr * rng.uniform(0.85, 1.15), 0.0, 1.0)
    return np.ascontiguousarray(arr)


class AUPatchDataset:
    """Patch stacks + per-patch AU weights + label."""

    def __init__(
        self,
        folder: str,
        *,
        max_frames: Optional[int] = None,
        max_aus: int = 17,
        augment: bool = False,
        seed: int = 0,
    ):
        self.folder = folder
        self.max_frames = max_frames
        self.max_aus = max_aus
        self.augment = augment
        self._rng = np.random.default_rng(seed)
        stems = _list_stems(folder)
        labels = [label_from_filename(s + ".npy") for s in stems]
        if augment:
            stems, labels = _balance_oversample(stems, labels, self._rng)
        self.stems = stems
        self.all_labels = labels

    def __len__(self):
        return len(self.stems)

    def __getitem__(self, idx: int):
        stem = self.stems[idx]
        patches = np.load(os.path.join(self.folder, stem + ".npy")).astype(np.float32)
        if patches.max() > 1.5:
            patches = patches / 255.0
        wpath = os.path.join(self.folder, stem + "_weights.npy")
        if os.path.exists(wpath):
            weights = np.load(wpath).astype(np.float32)
        else:
            weights = np.ones(patches.shape[:2], np.float32)
        if self.max_frames is not None:
            patches, weights = patches[: self.max_frames], weights[: self.max_frames]
        patches, weights = patches[:, : self.max_aus], weights[:, : self.max_aus]
        if self.augment:
            patches = _augment(patches, self._rng)
        return patches, weights, self.all_labels[idx]


def au_patch_collate(items, *, buckets=None, max_aus: int, batch_size: Optional[int] = None):
    """-> (patches (B,T,A,h,w,3), weights (B,T,A), labels, lengths)."""
    max_t = max(p.shape[0] for p, _, _ in items)
    T = bucket_length(max_t, buckets)
    B = batch_size if batch_size is not None else len(items)
    h, w, c = items[0][0].shape[2:]
    patches = np.zeros((B, T, max_aus, h, w, c), np.float32)
    weights = np.zeros((B, T, max_aus), np.float32)
    labels = np.zeros((B,), np.float32)
    lengths = np.zeros((B,), np.int32)
    for i, (p, wt, y) in enumerate(items):
        t = min(p.shape[0], T)
        a = p.shape[1]
        patches[i, :t, :a] = p[:t]
        weights[i, :t, :a] = wt[:t]
        labels[i] = y
        lengths[i] = t
    return patches, weights, labels, lengths


def get_patch_image_loaders(
    data_root: str,
    *,
    batch_size: int = 2,
    image_size: int = 128,
    max_frames: int = 60,
    max_aus: int = 17,
    buckets: Optional[Sequence[int]] = None,
    augment_train: bool = True,
    augment_eval: bool = False,
    augment_test: bool = False,
    seed: int = 0,
    **_ignored,
) -> Tuple[DataLoader, DataLoader, DataLoader]:
    """(train, test, eval) patch loaders — the D6 entry point."""
    buckets = tuple(buckets) if buckets else (max_frames,)

    def make(split, augment, shuffle):
        ds = AUPatchDataset(
            os.path.join(data_root, split),
            max_frames=max_frames,
            max_aus=max_aus,
            augment=augment,
            seed=seed,
        )
        return DataLoader(
            ds,
            batch_size,
            shuffle=shuffle,
            seed=seed,
            collate=lambda items: au_patch_collate(
                items, buckets=buckets, max_aus=max_aus, batch_size=batch_size
            ),
        )

    return (
        make("train", augment_train, True),
        make("test", augment_test, False),
        make("eval", augment_eval, False),
    )


class JointAUVideoDataset:
    """Pairs face-frame npys with AU patch stacks by filename stem (D3)."""

    def __init__(
        self,
        video_root: str,
        au_root: str,
        *,
        max_frames: Optional[int] = None,
        max_aus: int = 17,
        seed: int = 0,
    ):
        self.video_root = video_root
        self.au = AUPatchDataset(au_root, max_frames=max_frames, max_aus=max_aus, seed=seed)
        video_stems = set(_list_stems(video_root))
        keep = [i for i, s in enumerate(self.au.stems) if s in video_stems]
        self.au.stems = [self.au.stems[i] for i in keep]
        self.au.all_labels = [self.au.all_labels[i] for i in keep]
        self.all_labels = self.au.all_labels
        self.max_frames = max_frames

    def __len__(self):
        return len(self.au)

    def __getitem__(self, idx: int):
        patches, weights, label = self.au[idx]
        video = np.load(os.path.join(self.video_root, self.au.stems[idx] + ".npy")).astype(np.float32)
        if video.max() > 1.5:
            video = video / 255.0
        if self.max_frames is not None:
            video = video[: self.max_frames]
        return video, patches, weights, label


def joint_collate(items, *, buckets=None, max_aus: int, batch_size: Optional[int] = None):
    """-> (videos, au_patches, labels, au_mask, au_weight, lengths)."""
    max_t = max(max(v.shape[0], p.shape[0]) for v, p, _, _ in items)
    T = bucket_length(max_t, buckets)
    B = batch_size if batch_size is not None else len(items)
    vh, vw, vc = items[0][0].shape[1:]
    ph, pw, pc = items[0][1].shape[2:]
    videos = np.zeros((B, T, vh, vw, vc), np.float32)
    patches = np.zeros((B, T, max_aus, ph, pw, pc), np.float32)
    au_mask = np.zeros((B, T, max_aus), np.float32)
    au_weight = np.zeros((B, T, max_aus), np.float32)
    labels = np.zeros((B,), np.float32)
    lengths = np.zeros((B,), np.int32)
    for i, (v, p, wt, y) in enumerate(items):
        tv = min(v.shape[0], T)
        tp = min(p.shape[0], T)
        a = p.shape[1]
        videos[i, :tv] = v[:tv]
        patches[i, :tp, :a] = p[:tp]
        au_mask[i, :tp, :a] = 1.0
        au_weight[i, :tp, :a] = wt[:tp]
        labels[i] = y
        lengths[i] = max(tv, tp)
    return videos, patches, labels, au_mask, au_weight, lengths


def get_joint_dataloader(
    video_root: str,
    au_root: str,
    *,
    batch_size: int = 2,
    shuffle: bool = True,
    max_frames: int = 75,
    max_aus: int = 17,
    image_size: int = 128,
    buckets: Optional[Sequence[int]] = None,
    return_weights: bool = True,
    seed: int = 0,
    **_ignored,
) -> Tuple[DataLoader, DataLoader, DataLoader]:
    """(train, test, eval) joint loaders — the D3 entry point."""
    buckets = tuple(buckets) if buckets else (max_frames,)

    def make(split, do_shuffle):
        ds = JointAUVideoDataset(
            os.path.join(video_root, split),
            os.path.join(au_root, split),
            max_frames=max_frames,
            max_aus=max_aus,
            seed=seed,
        )
        collate = lambda items: joint_collate(
            items, buckets=buckets, max_aus=max_aus, batch_size=batch_size
        )
        if not return_weights:
            full = collate

            def collate(items, _full=full):  # noqa: redefine
                videos, patches, labels, _m, _w, lengths = _full(items)
                return videos, patches, labels, lengths

        return DataLoader(ds, batch_size, shuffle=do_shuffle, seed=seed, collate=collate)

    return make("train", shuffle), make("test", False), make("eval", False)
