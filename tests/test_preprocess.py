"""Offline preprocessing: synthetic videos/wavs -> npy trees with the
reference's on-disk contracts (UADFV 100/20/20, FakeAVCeleb 80/10/10 cap 300,
audio 120/24/24)."""
import os

import cv2
import numpy as np
import pytest
from scipy.io import wavfile

from multimodal_deepfake_detection_tpu.cli import preprocess_audio, preprocess_faces
from multimodal_deepfake_detection_tpu.data.face_detect import (
    center_box_detector,
    crop_with_margin,
    make_detector,
)


def _write_video(path, n_frames, size=64):
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (size, size))
    assert w.isOpened()
    for i in range(n_frames):
        frame = np.full((size, size, 3), (i * 7) % 255, np.uint8)
        w.write(frame)
    w.release()


@pytest.fixture()
def uadfv_root(tmp_path):
    root = tmp_path / "raw"
    for label, n in (("real", 12), ("fake", 12)):
        os.makedirs(root / label)
        _write_video(str(root / label / f"vid0.avi"), n)
    # one video too short -> must be skipped
    _write_video(str(root / "real" / "short.avi"), 3)
    return str(root)


def test_uadfv_preprocess_contract(uadfv_root, tmp_path):
    out = str(tmp_path / "proc")
    logs = []
    written = preprocess_faces.main(
        [
            "--dataset_root", uadfv_root,
            "--out_root", out,
            "--mode", "uadfv",
            "--size", "32",
        ],
        log=logs.append,
    )
    # splits shrunk? no - defaults are 100/20/20 and our videos have 12 frames:
    # everything is skipped. That validates the skip rule.
    assert written == []
    assert any("skip" in l and "short" in l for l in logs)


def test_uadfv_preprocess_small_splits(uadfv_root, tmp_path):
    from multimodal_deepfake_detection_tpu.data.preprocess import process_uadfv_faces

    out = str(tmp_path / "proc2")
    written = process_uadfv_faces(
        uadfv_root, out, size=32, splits=(("train", 6), ("eval", 2), ("test", 2)), log=lambda s: None
    )
    assert sorted(written) == ["fake_vid0", "real_vid0"]
    arr = np.load(os.path.join(out, "train", "real_vid0.npy"))
    assert arr.shape == (6, 32, 32, 3) and arr.dtype == np.uint8
    assert np.load(os.path.join(out, "eval", "real_vid0.npy")).shape[0] == 2


def test_fakeavceleb_preprocess_contract(tmp_path):
    root = tmp_path / "favc"
    for label in ("real", "fake"):
        for sub in ("id0", "id1"):
            os.makedirs(root / label / sub)
            for k in range(3):
                _write_video(str(root / label / sub / f"c{k}.avi"), 5)
    out = str(tmp_path / "frames")
    written = preprocess_faces.main(
        ["--dataset_root", str(root), "--out_root", out, "--mode", "fakeavceleb", "--size", "32"],
        log=lambda s: None,
    )
    assert len(written) == 12
    names = [f for s in ("train", "eval", "test") if os.path.isdir(f"{out}/{s}") for f in os.listdir(f"{out}/{s}")]
    assert len(names) == 12
    assert any(n.startswith("real_id0_") for n in names)
    arr = np.load(next(f"{out}/{s}/{f}" for s in ("train", "eval", "test") if os.path.isdir(f"{out}/{s}") for f in os.listdir(f"{out}/{s}")))
    assert arr.shape[1:] == (32, 32, 3)


def test_audio_preprocess_from_wav(tmp_path):
    root = tmp_path / "aud"
    rng = np.random.default_rng(0)
    for label in ("real", "fake"):
        os.makedirs(root / label)
        # 1.6 s @ 16 kHz -> 161 MFCC frames >= 168? need 168: use 1.8 s -> 181
        wav = (rng.normal(0, 0.1, int(1.8 * 16000)) * 32767).astype(np.int16)
        wavfile.write(str(root / label / "clip.wav"), 16000, wav)
    out = str(tmp_path / "mfcc")
    written = preprocess_audio.main(
        ["--dataset_root", str(root), "--out_root", out], log=lambda s: None
    )
    assert sorted(written) == ["fake_clip", "real_clip"]
    tr = np.load(os.path.join(out, "train", "real_clip.npy"))
    ev = np.load(os.path.join(out, "eval", "real_clip.npy"))
    te = np.load(os.path.join(out, "test", "real_clip.npy"))
    assert tr.shape == (120, 13) and ev.shape == (24, 13) and te.shape == (24, 13)


def test_detectors():
    frame = np.zeros((40, 60, 3), np.uint8)
    assert center_box_detector(frame) == (10, 0, 50, 40)
    assert make_detector("none")(frame) == (0, 0, 60, 40)
    crop = crop_with_margin(frame, (10, 0, 50, 40), margin=20)
    assert crop.shape[:2] == (40, 60)  # clamped to frame
    with pytest.raises(ValueError):
        make_detector("yunet")
