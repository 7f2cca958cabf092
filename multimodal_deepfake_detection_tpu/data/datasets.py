"""npy-tree datasets with the reference's filename-label contract.

A dataset directory is a flat folder of ``.npy`` arrays; the label is encoded
in the filename prefix: ``real_*`` -> 0, anything else -> 1
(``/root/reference/video_dataloader.py:30-32``, ``audio_dataloader.py:22-23``).

Two array flavors exist on disk (SURVEY.md §2 C4-C8):
* face crops: uint8 (T, H, W, 3) — emitted by the face preprocessors,
* MFCC clips: float (T, 13) — emitted by the audio preprocessor.

Item transforms normalize these to model-ready float32:
* ``video``: (T, H, W, 3) / 255.0 — NHWC (the reference permutes to NCHW for
  torch; TPU wants channel-last so we keep the disk layout),
* ``audio``: (T, 13) -> (T, 3, 13) by channel-tripling
  (``audio_dataloader.py:25-26``).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def label_from_filename(path: str) -> int:
    name = os.path.basename(path)
    return 0 if name.split("_")[0].lower() == "real" else 1


def _video_transform(arr: np.ndarray) -> np.ndarray:
    return np.asarray(arr, np.float32) / 255.0


def _audio_transform(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, np.float32)  # (T, 13)
    return np.repeat(arr[:, None, :], 3, axis=1)  # (T, 3, 13)


_TRANSFORMS = {"video": _video_transform, "audio": _audio_transform, "raw": np.asarray}


class NpyFolderDataset:
    """Flat folder of .npy files; filename prefix is the label."""

    def __init__(self, folder_path: str, kind: str = "video", max_frames: Optional[int] = None):
        if kind not in _TRANSFORMS:
            raise ValueError(f"kind must be one of {sorted(_TRANSFORMS)}")
        self.folder_path = folder_path
        self.kind = kind
        self.max_frames = max_frames
        self.files: List[str] = sorted(
            os.path.join(folder_path, f) for f in os.listdir(folder_path) if f.endswith(".npy")
        )
        self.all_labels: List[int] = [label_from_filename(f) for f in self.files]

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        arr = np.load(self.files[idx])
        if self.max_frames is not None:
            arr = arr[: self.max_frames]
        return _TRANSFORMS[self.kind](arr), self.all_labels[idx]

    def class_counts(self) -> Tuple[int, int]:
        labels = np.asarray(self.all_labels)
        return int((labels == 0).sum()), int((labels == 1).sum())
