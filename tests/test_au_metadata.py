"""D3/D6 metadata contracts: csv / LAV-DF label-split modes of the AU loaders.

Drives get_patch_image_loaders and get_joint_dataloader from synthetic
``meta_data.csv`` and LAV-DF ``metadata.json`` trees — the call-site kwargs the
reference pins (/root/reference/test_au_face.py:236-260,
train_au_patch.py:186-196,365-375) and VERDICT r2 flagged as silently dropped.
"""
import csv
import json
import os

import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.data import (
    get_joint_dataloader,
    get_patch_image_loaders,
)

SPLITS = ("train", "test", "eval")


def _write_patch(path, frames=3, n_aus=3, size=16, seed=0):
    rng = np.random.default_rng(seed)
    arr = (rng.random((frames, n_aus, size, size, 3)) * 255).astype(np.uint8)
    np.save(path, arr)
    np.save(path[:-4] + "_weights.npy", rng.random((frames, n_aus)).astype(np.float32))


def _write_video(path, frames=3, size=24, seed=0):
    rng = np.random.default_rng(seed)
    np.save(path, (rng.random((frames, size, size, 3)) * 255).astype(np.uint8))


@pytest.fixture()
def csv_patch_tree(tmp_path):
    """Flat patch tree + official-schema meta_data.csv with explicit splits."""
    root = tmp_path / "patches"
    root.mkdir()
    rows = []
    stems = {}
    for i, (typ, label, split) in enumerate(
        [
            ("RealVideo-RealAudio", 0, "train"),
            ("FakeVideo-FakeAudio", 1, "train"),
            ("RealVideo-RealAudio", 0, "test"),
            ("FakeVideo-FakeAudio", 1, "test"),
            ("RealVideo-RealAudio", 0, "eval"),
            ("FakeVideo-FakeAudio", 1, "eval"),
        ]
    ):
        vid = f"clip{i:03d}"
        stem = f"{'real' if label == 0 else 'fake'}_id{i:05d}_{vid}"
        _write_patch(str(root / f"{stem}.npy"), seed=i)
        rows.append(
            {"type": typ, "path": f"{typ}/African/men/id{i:05d}", "filename": f"{vid}.mp4", "split": split}
        )
        stems.setdefault(split, []).append((stem, label))
    # two unmatched-on-disk stems (absent from the csv)
    for j in range(2):
        _write_patch(str(root / f"extra_unmatched{j}.npy"), seed=100 + j)
    csv_path = tmp_path / "meta_data.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["type", "path", "filename", "split"])
        w.writeheader()
        w.writerows(rows)
    return str(root), str(csv_path), stems


def test_patch_loader_csv_mode(csv_patch_tree):
    root, csv_path, stems = csv_patch_tree
    train_l, test_l, eval_l = get_patch_image_loaders(
        root, csv_path=csv_path, batch_size=2, image_size=0, max_frames=3,
        max_aus=3, augment_train=False, seed=0,
    )
    for loader, split in ((train_l, "train"), (test_l, "test"), (eval_l, "eval")):
        want = sorted(stems[split])
        got = sorted(
            (os.path.basename(p)[:-4], l) for p, l in loader.dataset.entries
        )
        assert got == want, f"{split}: {got} != {want}"
    patches, weights, labels, lengths = next(iter(train_l))
    assert patches.shape == (2, 3, 3, 16, 16, 3)
    assert set(np.asarray(labels).astype(int)) == {0, 1}


def test_patch_loader_include_unmatched_real(csv_patch_tree):
    root, csv_path, _ = csv_patch_tree
    loaders = get_patch_image_loaders(
        root, csv_path=csv_path, batch_size=2, image_size=0, max_frames=3,
        max_aus=3, augment_train=False, include_unmatched_real=True,
        unmatched_split_seed=42, seed=0,
    )
    all_entries = [e for l in loaders for e in l.dataset.entries]
    unmatched = [(p, lab) for p, lab in all_entries if "unmatched" in p]
    assert len(unmatched) == 2
    assert all(lab == 0 for _, lab in unmatched)
    # deterministic split assignment: same seed -> same placement
    loaders2 = get_patch_image_loaders(
        root, csv_path=csv_path, batch_size=2, image_size=0, max_frames=3,
        max_aus=3, augment_train=False, include_unmatched_real=True,
        unmatched_split_seed=42, seed=0,
    )
    for l1, l2 in zip(loaders, loaders2):
        assert l1.dataset.entries == l2.dataset.entries


def test_patch_loader_image_size_applied(csv_patch_tree):
    root, csv_path, _ = csv_patch_tree
    train_l, *_ = get_patch_image_loaders(
        root, csv_path=csv_path, batch_size=2, image_size=8, max_frames=3,
        max_aus=3, augment_train=False, seed=0,
    )
    patches, *_ = next(iter(train_l))
    assert patches.shape == (2, 3, 3, 8, 8, 3)


def test_patch_loader_unknown_kwarg_raises(csv_patch_tree):
    root, csv_path, _ = csv_patch_tree
    with pytest.raises(TypeError):
        get_patch_image_loaders(root, csv_path=csv_path, bogus_kwarg=1)
    with pytest.raises(ValueError):
        get_patch_image_loaders(root, mode="lavdf")  # lavdf needs its json


@pytest.fixture()
def lavdf_joint_tree(tmp_path):
    """Paired video+AU trees + LAV-DF metadata.json (fake iff fake_periods)."""
    vroot, aroot = tmp_path / "videos", tmp_path / "aus"
    vroot.mkdir()
    aroot.mkdir()
    meta, stems = [], {}
    for i, (label, split) in enumerate(
        [(0, "train"), (1, "train"), (0, "dev"), (1, "dev"), (0, "test"), (1, "test")]
    ):
        stem = f"{'real' if label == 0 else 'fake'}_{i:06d}"
        _write_video(str(vroot / f"{stem}.npy"), seed=i)
        _write_patch(str(aroot / f"{stem}.npy"), seed=i)
        meta.append(
            {
                "file": f"{split}/{stem}.mp4",
                "split": split,
                "fake_periods": [[0.1, 0.4]] if label else [],
                "n_fakes": int(label),
            }
        )
        stems.setdefault("eval" if split == "dev" else split, []).append((stem, label))
    jpath = tmp_path / "metadata.json"
    with open(jpath, "w") as f:
        json.dump(meta, f)
    return str(vroot), str(aroot), str(jpath), stems


def test_joint_loader_lavdf_mode(lavdf_joint_tree):
    vroot, aroot, jpath, stems = lavdf_joint_tree
    train_l, test_l, eval_l = get_joint_dataloader(
        vroot, aroot, batch_size=2, image_size=0, max_frames=3, max_aus=3,
        lavdf_mode=True, lavdf_json_path=jpath, return_weights=True, seed=0,
    )
    for loader, split in ((train_l, "train"), (test_l, "test"), (eval_l, "eval")):
        got = sorted(
            (os.path.basename(v)[:-4], l) for v, _a, l in loader.dataset.entries
        )
        assert got == sorted(stems[split]), split
        assert loader.dataset.all_labels == [l for _, _, l in loader.dataset.entries]
    videos, patches, labels, au_mask, au_weight, lengths = next(iter(train_l))
    assert videos.shape == (2, 3, 24, 24, 3)
    assert patches.shape == (2, 3, 3, 16, 16, 3)


def test_joint_loader_csv_mode_and_image_size(tmp_path):
    vroot, aroot = tmp_path / "v", tmp_path / "a"
    vroot.mkdir()
    aroot.mkdir()
    rows = []
    for i, (label, split) in enumerate([(0, "train"), (1, "train"), (1, "eval")]):
        stem = f"vid{i:03d}"
        _write_video(str(vroot / f"{stem}.npy"), seed=i)
        _write_patch(str(aroot / f"{stem}.npy"), seed=i)
        rows.append({"path": f"{stem}.mp4", "label": str(label), "split": split})
    csv_path = tmp_path / "meta.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path", "label", "split"])
        w.writeheader()
        w.writerows(rows)
    train_l, _test_l, eval_l = get_joint_dataloader(
        str(vroot), str(aroot), batch_size=2, image_size=12, max_frames=3,
        max_aus=3, csv_path=str(csv_path), return_weights=True, seed=0,
    )
    assert len(train_l.dataset) == 2 and len(eval_l.dataset) == 1
    videos, patches, *_ = next(iter(train_l))
    # image_size resizes BOTH streams in the loader (D3 contract pins
    # image_size=128; /root/reference/train_au_face.py:563-574)
    assert videos.shape == (2, 3, 12, 12, 3)
    assert patches.shape == (2, 3, 3, 12, 12, 3)


def test_joint_loader_unknown_kwarg_raises(tmp_path):
    with pytest.raises(TypeError):
        get_joint_dataloader(str(tmp_path), str(tmp_path), not_a_kwarg=True)
    with pytest.raises(ValueError):
        get_joint_dataloader(str(tmp_path), str(tmp_path), lavdf_mode=True)
