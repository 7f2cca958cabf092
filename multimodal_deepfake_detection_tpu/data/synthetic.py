"""Synthetic micro-dataset generators (CPU-runnable smoke/e2e tests).

The reference has no test data and no tests; these generators fabricate
directory trees with the exact on-disk contracts its preprocessors emit
(SURVEY.md §4 'end-to-end smoke train on a generated micro-dataset'):

* face npys: uint8 (T, H, W, 3), filenames ``{real|fake}_<id>.npy``
  (``/root/reference/UADFV_face_dataset.py:61-73``),
* audio npys: float32 (T, 13) MFCC frames (``wavfake_audio_dataset.py:69-72``),
* AU patch npys: float32 (T, A, H, W, 3) patch stacks + (T, A) AU weights.

Fakes carry a weak class-dependent signal (brightness/offset shift) so a few
training steps measurably move AUC above 0.5 — making smoke tests assert
learning, not just absence of crashes.
"""
from __future__ import annotations

import os

import numpy as np


def _signal(rng, label: int, strength: float = 0.35):
    return strength * label + rng.normal(0, 0.05)


def make_face_npy_tree(
    root: str,
    *,
    n_per_class: int = 4,
    frames: int = 6,
    size: int = 64,
    seed: int = 0,
) -> str:
    """Write {root}/{split}/ face npys for train/eval/test splits."""
    rng = np.random.default_rng(seed)
    for split in ("train", "eval", "test"):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for label_name, label in (("real", 0), ("fake", 1)):
            for i in range(n_per_class):
                base = rng.uniform(0.3, 0.5) + _signal(rng, label)
                vid = np.clip(rng.normal(base, 0.1, (frames, size, size, 3)), 0, 1)
                np.save(os.path.join(d, f"{label_name}_{i}.npy"), (vid * 255).astype(np.uint8))
    return root


def make_audio_npy_tree(
    root: str,
    *,
    n_per_class: int = 4,
    frames: int = 20,
    n_mfcc: int = 13,
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    for split in ("train", "eval", "test"):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for label_name, label in (("real", 0), ("fake", 1)):
            for i in range(n_per_class):
                mfcc = rng.normal(_signal(rng, label, 1.5), 1.0, (frames, n_mfcc))
                np.save(os.path.join(d, f"{label_name}_{i}.npy"), mfcc.astype(np.float32))
    return root


def make_joint_tree(
    video_root: str,
    au_root: str,
    *,
    n_per_class: int = 3,
    frames: int = 4,
    n_aus: int = 5,
    face_size: int = 64,
    patch_size: int = 32,
    seed: int = 0,
):
    """Paired face npys + AU patch stacks with matching stems (the D3 joint
    dataset's on-disk contract)."""
    rng = np.random.default_rng(seed)
    for split in ("train", "eval", "test"):
        vd = os.path.join(video_root, split)
        ad = os.path.join(au_root, split)
        os.makedirs(vd, exist_ok=True)
        os.makedirs(ad, exist_ok=True)
        for label_name, label in (("real", 0), ("fake", 1)):
            for i in range(n_per_class):
                base = rng.uniform(0.3, 0.5) + _signal(rng, label)
                vid = np.clip(rng.normal(base, 0.1, (frames, face_size, face_size, 3)), 0, 1)
                patches = np.clip(rng.normal(base, 0.1, (frames, n_aus, patch_size, patch_size, 3)), 0, 1)
                w = rng.dirichlet(np.ones(n_aus), size=frames).astype(np.float32)
                np.save(os.path.join(vd, f"{label_name}_{i}.npy"), (vid * 255).astype(np.uint8))
                np.save(os.path.join(ad, f"{label_name}_{i}.npy"), (patches * 255).astype(np.uint8))
                np.save(os.path.join(ad, f"{label_name}_{i}_weights.npy"), w)
    return video_root, au_root


def make_au_patch_tree(
    root: str,
    *,
    n_per_class: int = 3,
    frames: int = 4,
    n_aus: int = 5,
    size: int = 32,
    seed: int = 0,
) -> str:
    """AU patch stacks: {split}/{label}_{i}.npy (T, A, H, W, 3) uint8 and
    sibling ``{label}_{i}_weights.npy`` (T, A) float32."""
    rng = np.random.default_rng(seed)
    for split in ("train", "eval", "test"):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for label_name, label in (("real", 0), ("fake", 1)):
            for i in range(n_per_class):
                base = rng.uniform(0.3, 0.5) + _signal(rng, label)
                patches = np.clip(rng.normal(base, 0.1, (frames, n_aus, size, size, 3)), 0, 1)
                w = rng.dirichlet(np.ones(n_aus), size=frames).astype(np.float32)
                np.save(os.path.join(d, f"{label_name}_{i}.npy"), (patches * 255).astype(np.uint8))
                np.save(os.path.join(d, f"{label_name}_{i}_weights.npy"), w)
    return root
