"""AU-patch and joint face+AU datasets (phantom D6 / D3 loaders).

Reconstructions of the absent ``Dataset.AUPatchFeatureLoader.
get_patch_image_loaders`` and ``Dataset.AuVidDataset.get_joint_dataloader``,
to the contracts pinned by their call sites (SURVEY.md §2.3):

* patch loaders return (train, test, eval) and yield
  ``(patches (B,T,A,C,H,W-analog), au_weights (B,T,A), labels)`` with
  augment_train/eval/test balancing flags and csv/LAV-DF metadata label
  modes (``/root/reference/train_au_patch.py:186-196``,
  ``test_au_patch.py:438-449``, dead variant ``train_au_patch.py:365-375``
  for ``include_unmatched_real``/``unmatched_split_seed``);
* the joint loader returns (train, test, eval), yields
  ``(videos, au_patches, labels[, au_mask, au_weight])`` under
  ``return_weights``, exposes ``dataset.all_labels``, and accepts
  ``csv_path | lavdf_mode+lavdf_json_path`` metadata sources
  (``train_au_face.py:563-574,509-518``, ``test_au_face.py:236-260``).

On-disk contracts:

* **flat split trees** (no metadata kwargs): ``{root}/{split}/{label}_{id}.npy``
  patch stacks (T, A, h, w, 3) uint8 with sibling ``{label}_{id}_weights.npy``
  (T, A) float32; labels from the filename prefix.
* **metadata mode** (``csv_path`` or LAV-DF json given): the tree under
  ``root`` is scanned recursively; each stem is matched against the metadata
  entries (full path key, then unique basename key — see ``_match_stem``) and
  takes its label AND split from the metadata, the reference's
  ``meta_data.csv``/LAV-DF layout (D1/D2 reuse: the parsers live in
  ``data/video_enhanced.py:54-88``). Unmatched stems are dropped unless
  ``include_unmatched_real`` labels them real and hash-splits them 80/10/10
  with ``unmatched_split_seed``.

``image_size`` resizes every patch (and joint-mode video frame) in the loader
(the D3 contract pins ``image_size=128``, ``train_au_face.py:563-574``);
``image_size in (None, 0)`` keeps native resolution.

All arrays stay NHWC (TPU layout); time and AU axes are zero-padded to
static buckets with an ``au_mask`` marking real patches.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .collate import bucket_length
from .datasets import label_from_filename
from .loader import DataLoader
from .video_enhanced import _hash_split, _load_fakeavceleb_csv, _load_lavdf_json

SPLITS = ("train", "test", "eval")


def _list_stems(folder: str) -> List[str]:
    return sorted(
        f[:-4]
        for f in os.listdir(folder)
        if f.endswith(".npy") and not f.endswith("_weights.npy")
    )


def _walk_stems(root: str) -> Dict[str, str]:
    """stem -> path of every patch npy under ``root`` (flat or nested),
    weights siblings excluded."""
    out: Dict[str, str] = {}
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".npy") and not f.endswith("_weights.npy"):
                out[f[:-4]] = os.path.join(dirpath, f)
    return out


def _metadata_index(rows):
    """Build (full-path-key, unique-basename-key) lookup tables from
    (path, label, split) metadata rows."""
    full: Dict[str, Tuple[int, str]] = {}
    base: Dict[str, Tuple[int, str]] = {}
    dup = set()
    for path, label, split in rows:
        noext = os.path.splitext(path)[0]
        fkey = noext.replace("/", "_").replace("\\", "_")
        full[fkey] = (label, split)
        bkey = os.path.basename(noext)
        if bkey in base and base[bkey] != (label, split):
            dup.add(bkey)
        base[bkey] = (label, split)
    for k in dup:  # ambiguous basenames never match on their own
        base.pop(k)
    return full, base


def _match_stem(stem: str, full, base) -> Optional[Tuple[int, str]]:
    """Match a disk stem against metadata: the stem itself or any
    underscore-suffix of it (preprocessors prepend ``{label}_{subfolder}_``)
    against the full path key first, then the unique basename key."""
    cands = [stem] + [stem[i + 1 :] for i, ch in enumerate(stem) if ch == "_"]
    for c in cands:
        if c in full:
            return full[c]
    for c in cands:
        if c in base:
            return base[c]
    return None


def _load_metadata_rows(mode: str, csv_path: Optional[str], lavdf_json: Optional[str]):
    if lavdf_json:
        return _load_lavdf_json(lavdf_json)
    if csv_path:
        return _load_fakeavceleb_csv(csv_path)
    raise ValueError(f"metadata mode {mode!r} requires csv_path or a LAV-DF json")


def _resolve_metadata_entries(
    root: str,
    rows,
    *,
    include_unmatched_real: bool = False,
    unmatched_split_seed: int = 42,
) -> Dict[str, List[Tuple[str, int]]]:
    """split -> [(path, label), ...] for every patch npy under ``root``,
    labeled and split-assigned by the metadata."""
    full, base = _metadata_index(rows)
    out: Dict[str, List[Tuple[str, int]]] = {s: [] for s in SPLITS}
    for stem, path in sorted(_walk_stems(root).items()):
        hit = _match_stem(stem, full, base)
        if hit is None:
            if not include_unmatched_real:
                continue
            # dead-variant contract (/root/reference/train_au_patch.py:365-375):
            # on-disk files absent from the csv are real videos; deterministic
            # 80/10/10 split keyed by the seed
            hit = (0, _hash_split(f"{unmatched_split_seed}:{stem}"))
        label, split = hit
        out.setdefault(split, []).append((path, label))
    return out


def _balance_oversample(entries: List[Tuple[str, int]], rng: np.random.Generator):
    labels = [l for _, l in entries]
    idx0 = [i for i, l in enumerate(labels) if l == 0]
    idx1 = [i for i, l in enumerate(labels) if l == 1]
    if not idx0 or not idx1:
        return entries
    minority, majority = (idx0, idx1) if len(idx0) < len(idx1) else (idx1, idx0)
    extra = rng.choice(minority, size=len(majority) - len(minority), replace=True)
    order = list(range(len(entries))) + [int(i) for i in extra]
    return [entries[i] for i in order]


def _augment(arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Light spatial/photometric augmentation (flip + brightness jitter)."""
    if rng.random() < 0.5:
        arr = arr[..., ::-1, :]  # horizontal flip (W axis)
    if rng.random() < 0.5:
        arr = np.clip(arr * rng.uniform(0.85, 1.15), 0.0, 1.0)
    return np.ascontiguousarray(arr)


def _resize_frames(arr: np.ndarray, size: int) -> np.ndarray:
    """Bilinear-resize the trailing (h, w, 3) planes of ``arr`` to size²."""
    if arr.shape[-3:-1] == (size, size):
        return arr
    import cv2

    flat = arr.reshape((-1,) + arr.shape[-3:])
    out = np.stack(
        [cv2.resize(p, (size, size), interpolation=cv2.INTER_LINEAR) for p in flat]
    )
    return out.reshape(arr.shape[:-3] + (size, size, arr.shape[-1]))


class AUPatchDataset:
    """Patch stacks + per-patch AU weights + label.

    ``entries`` (explicit [(path, label), ...], e.g. metadata-resolved)
    overrides the flat-folder filename-prefix contract.
    """

    def __init__(
        self,
        folder: Optional[str] = None,
        *,
        entries: Optional[List[Tuple[str, int]]] = None,
        image_size: Optional[int] = None,
        max_frames: Optional[int] = None,
        max_aus: int = 17,
        augment: bool = False,
        seed: int = 0,
    ):
        self.image_size = image_size or None
        self.max_frames = max_frames
        self.max_aus = max_aus
        self.augment = augment
        self._rng = np.random.default_rng(seed)
        if entries is None:
            if folder is None:
                raise ValueError("AUPatchDataset needs a folder or explicit entries")
            entries = [
                (os.path.join(folder, s + ".npy"), label_from_filename(s + ".npy"))
                for s in _list_stems(folder)
            ]
        if augment:
            entries = _balance_oversample(entries, self._rng)
        self.entries = entries
        self.all_labels = [l for _, l in entries]

    @property
    def stems(self) -> List[str]:
        return [os.path.basename(p)[:-4] for p, _ in self.entries]

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx: int):
        path, label = self.entries[idx]
        patches = np.load(path).astype(np.float32)
        if patches.max() > 1.5:
            patches = patches / 255.0
        wpath = path[:-4] + "_weights.npy"
        if os.path.exists(wpath):
            weights = np.load(wpath).astype(np.float32)
        else:
            weights = np.ones(patches.shape[:2], np.float32)
        if self.max_frames is not None:
            patches, weights = patches[: self.max_frames], weights[: self.max_frames]
        patches, weights = patches[:, : self.max_aus], weights[:, : self.max_aus]
        if self.image_size:
            patches = _resize_frames(patches, self.image_size)
        if self.augment:
            patches = _augment(patches, self._rng)
        return patches, weights, label


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
    mode: str = "fakeavceleb",
    csv_path: Optional[str] = None,
    lavdf_json: Optional[str] = None,
    batch_size: int = 2,
    image_size: int = 128,
    max_frames: int = 60,
    max_aus: int = 17,
    num_workers: int = 0,
    buckets: Optional[Sequence[int]] = None,
    augment_train: bool = True,
    augment_eval: bool = False,
    augment_test: bool = False,
    include_unmatched_real: bool = False,
    unmatched_split_seed: int = 42,
    seed: int = 0,
) -> Tuple[DataLoader, DataLoader, DataLoader]:
    """(train, test, eval) patch loaders — the D6 entry point.

    Full call-site contract (/root/reference/train_au_patch.py:186-196,
    test_au_patch.py:438-449, dead train_au_patch.py:365-375). Unknown kwargs
    raise — nothing is silently dropped. ``num_workers`` maps onto the
    background prefetch depth of the threaded loader and fans item loads
    (npy reads + resize) over that many threads per batch.
    """
    if mode not in ("fakeavceleb", "lavdf"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "lavdf" and not lavdf_json:
        raise ValueError("mode='lavdf' requires lavdf_json")
    buckets = tuple(buckets) if buckets else (max_frames,)
    prefetch = max(2, num_workers)

    if csv_path or lavdf_json:
        rows = _load_metadata_rows(mode, csv_path, lavdf_json)
        by_split = _resolve_metadata_entries(
            data_root,
            rows,
            include_unmatched_real=include_unmatched_real,
            unmatched_split_seed=unmatched_split_seed,
        )
        entries = {s: by_split.get(s, []) for s in SPLITS}
    else:
        if include_unmatched_real:
            raise ValueError("include_unmatched_real requires a metadata source (csv_path)")
        entries = {s: None for s in SPLITS}  # flat {root}/{split} trees

    def make(split, augment, shuffle):
        ds = AUPatchDataset(
            os.path.join(data_root, split) if entries[split] is None else None,
            entries=entries[split],
            image_size=image_size,
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
            prefetch=prefetch,
            item_workers=num_workers,
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
        video_root: Optional[str],
        au_root: Optional[str],
        *,
        entries: Optional[List[Tuple[str, str, int]]] = None,  # (video, au, label)
        image_size: Optional[int] = None,
        max_frames: Optional[int] = None,
        max_aus: int = 17,
        seed: int = 0,
    ):
        if entries is None:
            video_paths = {s: os.path.join(video_root, s + ".npy") for s in _list_stems(video_root)}
            au_entries = [
                (os.path.join(au_root, s + ".npy"), label_from_filename(s + ".npy"))
                for s in _list_stems(au_root)
                if s in video_paths
            ]
            entries = [
                (video_paths[os.path.basename(p)[:-4]], p, l) for p, l in au_entries
            ]
        self.entries = entries
        self.au = AUPatchDataset(
            entries=[(a, l) for _, a, l in entries],
            image_size=image_size,
            max_frames=max_frames,
            max_aus=max_aus,
            seed=seed,
        )
        self.all_labels = self.au.all_labels
        self.image_size = image_size or None
        self.max_frames = max_frames

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx: int):
        patches, weights, label = self.au[idx]
        video = np.load(self.entries[idx][0]).astype(np.float32)
        if video.max() > 1.5:
            video = video / 255.0
        if self.max_frames is not None:
            video = video[: self.max_frames]
        if self.image_size:
            video = _resize_frames(video, self.image_size)
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


def _resolve_joint_metadata_entries(
    video_root: str, au_root: str, rows
) -> Dict[str, List[Tuple[str, str, int]]]:
    """split -> [(video_path, au_path, label), ...]: stems present under BOTH
    roots, labeled and split-assigned by the metadata."""
    full, base = _metadata_index(rows)
    videos = _walk_stems(video_root)
    out: Dict[str, List[Tuple[str, str, int]]] = {s: [] for s in SPLITS}
    for stem, au_path in sorted(_walk_stems(au_root).items()):
        if stem not in videos:
            continue
        hit = _match_stem(stem, full, base)
        if hit is None:
            continue
        label, split = hit
        out.setdefault(split, []).append((videos[stem], au_path, label))
    return out


def get_joint_dataloader(
    video_root: str,
    au_root: str,
    *,
    batch_size: int = 2,
    shuffle: bool = True,
    max_frames: int = 75,
    max_aus: int = 17,
    image_size: int = 128,
    num_workers: int = 0,
    csv_path: Optional[str] = None,
    lavdf_mode: bool = False,
    lavdf_json_path: Optional[str] = None,
    buckets: Optional[Sequence[int]] = None,
    return_weights: bool = True,
    seed: int = 0,
) -> Tuple[DataLoader, DataLoader, DataLoader]:
    """(train, test, eval) joint loaders — the D3 entry point.

    Full call-site contract (/root/reference/train_au_face.py:563-574,
    test_au_face.py:236-260): ``csv_path`` or ``lavdf_mode+lavdf_json_path``
    switch labels/splits to metadata; ``image_size`` resizes both streams in
    the loader. Unknown kwargs raise — nothing is silently dropped.
    """
    if lavdf_mode and not lavdf_json_path:
        raise ValueError("lavdf_mode=True requires lavdf_json_path")
    buckets = tuple(buckets) if buckets else (max_frames,)
    prefetch = max(2, num_workers)

    if csv_path or lavdf_mode:
        rows = (
            _load_lavdf_json(lavdf_json_path)
            if lavdf_mode
            else _load_fakeavceleb_csv(csv_path)
        )
        by_split = _resolve_joint_metadata_entries(video_root, au_root, rows)
        entries = {s: by_split.get(s, []) for s in SPLITS}
    else:
        entries = {s: None for s in SPLITS}

    def make(split, do_shuffle):
        ds = JointAUVideoDataset(
            None if entries[split] is not None else os.path.join(video_root, split),
            None if entries[split] is not None else os.path.join(au_root, split),
            entries=entries[split],
            image_size=image_size,
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

        return DataLoader(
            ds, batch_size, shuffle=do_shuffle, seed=seed, prefetch=prefetch,
            item_workers=num_workers, collate=collate
        )

    return make("train", shuffle), make("test", False), make("eval", False)
