"""Enhanced (metadata-driven) video dataset: D2 contract tests."""
import json
import os

import cv2
import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.data.video_enhanced import (
    EnhancedVideoDataset,
    get_face_dataloader,
)


def _write_video(path, n_frames, size=48):
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (size, size))
    for i in range(n_frames):
        w.write(np.full((size, size, 3), (i * 9) % 255, np.uint8))
    w.release()


@pytest.fixture()
def lavdf_tree(tmp_path):
    root = tmp_path / "lavdf"
    os.makedirs(root)
    meta = []
    for i, (split, fakes) in enumerate(
        [("train", []), ("train", [[0.1, 0.5]]), ("dev", []), ("dev", [[0.2, 0.3]]), ("test", [])]
    ):
        fname = f"v{i}.avi"
        _write_video(str(root / fname), 6)
        meta.append({"file": fname, "split": split, "fake_periods": fakes, "n_fakes": len(fakes)})
    json_path = str(tmp_path / "metadata.json")
    with open(json_path, "w") as f:
        json.dump(meta, f)
    return str(root), json_path


def test_lavdf_raw_mode(lavdf_tree):
    root, json_path = lavdf_tree
    loader = get_face_dataloader(
        root,
        mode="lavdf_raw",
        subset="train",
        lavdf_json=json_path,
        batch_size=2,
        raw_video=True,
        use_face_detection=True,
        frame_size=(32, 32),
        max_frames=4,
    )
    assert [s[1] for s in loader.dataset.samples] == [0, 1]
    video_batch, labels, seq_lengths = next(iter(loader))
    assert video_batch.shape == (2, 4, 32, 32, 3)
    assert seq_lengths.tolist() == [4, 4]
    assert set(labels.tolist()) == {0.0, 1.0}
    # 'dev' aliases to eval subset
    dev = EnhancedVideoDataset(root, mode="lavdf_raw", subset="dev", lavdf_json=json_path)
    assert len(dev) == 2


def test_fakeavceleb_csv_official_schema(tmp_path):
    d = tmp_path / "npys"
    os.makedirs(d)
    rows = ["source,target1,method,category,type,race,gender,filename,path"]
    for i in range(6):
        typ = "RealVideo-RealAudio" if i % 2 == 0 else "FakeVideo-FakeAudio"
        np.save(d / f"clip{i}.npy", np.zeros((3, 16, 16, 3), np.uint8))
        rows.append(f"s,t,m,c,{typ},r,g,clip{i}.npy,.")
    csv_path = str(tmp_path / "meta_data.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows))

    all_samples = []
    for subset in ("train", "eval", "test"):
        ds = EnhancedVideoDataset(str(d), mode="fakeavceleb", subset=subset, csv_path=csv_path, max_frames=3)
        all_samples.extend(ds.samples)
    assert len(all_samples) == 6  # hash split covers every row exactly once
    labels = {os.path.basename(p): l for p, l, _ in all_samples}
    assert labels["clip0.npy"] == 0 and labels["clip1.npy"] == 1


def test_simple_csv_schema_and_sampling(tmp_path):
    d = tmp_path / "npys"
    os.makedirs(d)
    lines = ["path,label,split"]
    for i in range(10):
        np.save(d / f"c{i}.npy", np.zeros((2, 8, 8, 3), np.uint8))
        lines.append(f"c{i}.npy,{'real' if i < 8 else 'fake'},train")
    csv_path = str(tmp_path / "meta.csv")
    open(csv_path, "w").write("\n".join(lines))

    ds = EnhancedVideoDataset(str(d), mode="fakeavceleb", subset="train", csv_path=csv_path)
    assert len(ds) == 10 and ds.all_labels.count(1) == 2

    half = EnhancedVideoDataset(str(d), mode="fakeavceleb", subset="train", csv_path=csv_path, sample_percentage=0.5)
    assert len(half) == 5

    balanced = EnhancedVideoDataset(
        str(d), mode="fakeavceleb", subset="train", csv_path=csv_path, augment_minority=True
    )
    assert balanced.all_labels.count(1) == balanced.all_labels.count(0) == 8


def test_flat_npy_fallback(tmp_path):
    d = tmp_path / "flat"
    os.makedirs(d)
    np.save(d / "real_0.npy", np.zeros((2, 8, 8, 3), np.uint8))
    np.save(d / "fake_0.npy", np.zeros((2, 8, 8, 3), np.uint8))
    ds = EnhancedVideoDataset(str(d), mode="fakeavceleb", subset="train")
    assert sorted(ds.all_labels) == [0, 1]
    arr, label = ds[0]
    assert arr.dtype == np.float32 and arr.max() <= 1.0
