"""Metadata-driven video dataset (phantom D2, ``video_dataloader_enhanced``).

Reconstruction of the absent ``Dataset.video_dataloader_enhanced`` to the
contract pinned by its call sites (``/root/reference/train_visual.py:495-507``,
``test_visual.py:578-590``):

    get_face_dataloader(folder_path, mode in {fakeavceleb, lavdf, lavdf_raw},
        subset in {train, dev/eval, test}, csv_path, lavdf_json, batch_size,
        augment_minority, shuffle, sample_percentage, raw_video,
        use_face_detection, frame_size, max_frames) -> loader
    loader.dataset.samples == [(path, label, subset), ...]
    batches are (video_batch, labels, seq_lengths)

Label/split sources:

* **fakeavceleb** — ``meta_data.csv``. Two schemas are accepted: the official
  FakeAVCeleb metadata (a ``type`` column where ``RealVideo-RealAudio`` is the
  only real class, path columns joined), or a simple ``path,label[,split]``
  csv. Without split info, an 80/10/10 deterministic hash split is applied.
* **lavdf / lavdf_raw** — LAV-DF ``metadata.json``: a list of entries with
  ``file``, ``split`` and ``fake_periods``/``n_fakes``; fake iff any fake
  period exists.

``lavdf_raw``/``raw_video`` decodes videos with cv2 (optional pluggable face
detection + crop, frame resize, max_frames cap); otherwise items are
preprocessed ``.npy`` frame stacks.
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .collate import pad_collate
from .datasets import label_from_filename
from .face_detect import crop_with_margin, make_detector
from .loader import DataLoader

_SPLIT_ALIASES = {"train": "train", "dev": "eval", "eval": "eval", "val": "eval", "test": "test"}


def _hash_split(key: str, fracs=(0.8, 0.1, 0.1)) -> str:
    h = int(hashlib.md5(key.encode()).hexdigest(), 16) % 10_000
    if h < fracs[0] * 10_000:
        return "train"
    if h < (fracs[0] + fracs[1]) * 10_000:
        return "eval"
    return "test"


def _load_fakeavceleb_csv(csv_path: str) -> List[Tuple[str, int, str]]:
    import csv as csvmod

    rows = []
    with open(csv_path, newline="") as f:
        reader = csvmod.DictReader(f)
        fields = [c.strip().lower() for c in reader.fieldnames or []]
        for raw in reader:
            row = {k.strip().lower(): (v or "").strip() for k, v in raw.items()}
            if "type" in fields:  # official FakeAVCeleb schema
                label = 0 if row.get("type", "").lower() == "realvideo-realaudio" else 1
                path = row.get("path", "")
                vid = row.get("filename", row.get("vid", ""))
                full = os.path.join(path, vid) if vid else path
            else:  # simple schema: path,label[,split]
                full = row.get("path", "")
                lab = row.get("label", "")
                label = 0 if lab.lower() in ("0", "real") else 1
            split = _SPLIT_ALIASES.get(row.get("split", "").lower(), None)
            if split is None:
                split = _hash_split(full)
            rows.append((full, label, split))
    return rows


def _load_lavdf_json(json_path: str) -> List[Tuple[str, int, str]]:
    with open(json_path) as f:
        meta = json.load(f)
    rows = []
    for entry in meta:
        n_fakes = entry.get("n_fakes", len(entry.get("fake_periods", []) or []))
        label = 1 if n_fakes else 0
        split = _SPLIT_ALIASES.get(str(entry.get("split", "train")).lower(), "train")
        rows.append((entry["file"], label, split))
    return rows


class EnhancedVideoDataset:
    """Samples resolved from metadata; items decoded from npy or raw video."""

    def __init__(
        self,
        folder_path: str,
        *,
        mode: str = "fakeavceleb",
        subset: str = "train",
        csv_path: Optional[str] = None,
        lavdf_json: Optional[str] = None,
        sample_percentage: float = 1.0,
        raw_video: Optional[bool] = None,
        use_face_detection: bool = False,
        face_detector: str = "center",
        frame_size: Tuple[int, int] = (224, 224),
        max_frames: int = 50,
        augment_minority: bool = False,
        native_decode: Optional[bool] = None,
        seed: int = 0,
    ):
        subset = _SPLIT_ALIASES.get(subset.lower(), subset)
        self.folder_path = folder_path
        self.mode = mode
        self.raw_video = bool(raw_video) if raw_video is not None else mode.endswith("_raw")
        self.use_face_detection = use_face_detection
        self._detector = make_detector(face_detector) if use_face_detection else None
        self.frame_size = tuple(frame_size)
        self.max_frames = max_frames
        # C++ MJPEG-AVI engine (native/video_decode.cc): fused GIL-free
        # decode+resize+normalize, DCT-domain downscale — measured 2.1x the
        # cv2 loop. Auto when available; face-detection needs full frames so
        # it stays on the cv2 path. Unsupported files fall back per-video.
        self.native_decode = (
            bool(native_decode) if native_decode is not None else not use_face_detection
        )
        rng = np.random.default_rng(seed)

        if mode in ("lavdf", "lavdf_raw"):
            if not lavdf_json:
                raise ValueError("lavdf modes require lavdf_json")
            rows = _load_lavdf_json(lavdf_json)
        elif mode == "fakeavceleb":
            if csv_path:
                rows = _load_fakeavceleb_csv(csv_path)
            else:
                # fall back to the filename-prefix contract on a flat npy tree
                rows = [
                    (f, label_from_filename(f), subset)
                    for f in sorted(os.listdir(folder_path))
                    if f.endswith(".npy")
                ]
        else:
            raise ValueError(f"unknown mode {mode!r}")

        samples = [(p, l, s) for p, l, s in rows if s == subset]
        if sample_percentage < 1.0 and samples:
            keep = max(1, int(len(samples) * sample_percentage))
            idx = rng.choice(len(samples), size=keep, replace=False)
            samples = [samples[int(i)] for i in sorted(idx)]
        if augment_minority and samples:
            labels = [l for _, l, _ in samples]
            n0, n1 = labels.count(0), labels.count(1)
            if 0 < min(n0, n1) < max(n0, n1):
                minority = 0 if n0 < n1 else 1
                pool = [s for s in samples if s[1] == minority]
                extra = rng.choice(len(pool), size=max(n0, n1) - min(n0, n1), replace=True)
                samples = samples + [pool[int(i)] for i in extra]
        self.samples = samples
        self.all_labels = [l for _, l, _ in samples]
        self._augment = augment_minority
        self._rng = rng

    def __len__(self):
        return len(self.samples)

    def _decode_video(self, path: str) -> np.ndarray:
        if self.native_decode and self._detector is None:
            from .native_video import decode_video

            arr = decode_video(path, size=self.frame_size, max_frames=self.max_frames)
            if arr is not None:
                return arr  # float32 RGB in [0, 1]
        import cv2

        cap = cv2.VideoCapture(path)
        frames = []
        try:
            while len(frames) < self.max_frames:
                ok, frame = cap.read()
                if not ok:
                    break
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if self._detector is not None:
                    box = self._detector(frame)
                    if box is None:
                        continue
                    frame = crop_with_margin(frame, box, margin=20)
                frames.append(cv2.resize(frame, self.frame_size))
        finally:
            cap.release()
        if not frames:
            frames = [np.zeros(self.frame_size + (3,), np.uint8)]
        return np.stack(frames)

    def __getitem__(self, idx: int):
        rel, label, _ = self.samples[idx]
        path = rel if os.path.isabs(rel) else os.path.join(self.folder_path, rel)
        if self.raw_video:
            arr = self._decode_video(path)
        else:
            if not path.endswith(".npy"):
                path = path + ".npy"
            arr = np.load(path)[: self.max_frames]
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return arr, label


def get_face_dataloader(
    folder_path: str,
    *,
    mode: str = "fakeavceleb",
    subset: str = "train",
    csv_path: Optional[str] = None,
    lavdf_json: Optional[str] = None,
    batch_size: int = 1,
    augment_minority: bool = False,
    shuffle: bool = False,
    sample_percentage: float = 1.0,
    raw_video: Optional[bool] = None,
    use_face_detection: bool = False,
    frame_size: Tuple[int, int] = (224, 224),
    max_frames: int = 50,
    buckets: Optional[Sequence[int]] = None,
    seed: int = 0,
    num_workers: int = 0,
) -> DataLoader:
    """The D2 entry point; yields (video_batch, labels, seq_lengths).

    ``num_workers`` (the reference's torch-DataLoader knob,
    /root/reference/train_visual.py:545-546) maps onto threaded decode
    fan-out: a batch's clips are decoded concurrently (cv2 and the native
    engines release the GIL), which is the scaling lever for the
    codec-bound raw-video path (PERF.md "native H.264 decode finding")."""
    ds = EnhancedVideoDataset(
        folder_path,
        mode=mode,
        subset=subset,
        csv_path=csv_path,
        lavdf_json=lavdf_json,
        sample_percentage=sample_percentage,
        raw_video=raw_video,
        use_face_detection=use_face_detection,
        frame_size=frame_size,
        max_frames=max_frames,
        augment_minority=augment_minority,
        seed=seed,
    )
    buckets = tuple(buckets) if buckets else (max_frames,)
    return DataLoader(
        ds,
        batch_size,
        shuffle=shuffle,
        seed=seed,
        collate=lambda items: pad_collate(items, buckets=buckets, batch_size=batch_size),
        item_workers=num_workers,
    )
