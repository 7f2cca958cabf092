"""Fused AV eval: pairing, sharded scoring, fusion metrics (config 5)."""
import os

import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.cli import test_av_fused, train_audio, train_visual
from multimodal_deepfake_detection_tpu.data import make_audio_npy_tree, make_face_npy_tree


@pytest.fixture(scope="module")
def av_trees(tmp_path_factory):
    root = tmp_path_factory.mktemp("av")
    # same stems across both trees ({real,fake}_{i}.npy)
    make_face_npy_tree(str(root / "faces"), n_per_class=3, frames=3, size=32)
    make_audio_npy_tree(str(root / "aud"), n_per_class=3, frames=10)
    return root


def test_av_fused_end_to_end(av_trees, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    train_visual.main(
        [
            "--train_folder", f"{av_trees}/faces/train",
            "--eval_folder", f"{av_trees}/faces/eval",
            "--checkpoint_dir", ckpt,
            "--hidden_dim", "8", "--batch_size", "3", "--epochs", "1",
            "--freeze_epochs", "1", "--buckets", "3",
            "--compute_dtype", "float32", "--save_resume_state", "false",
        ],
        log=lambda s: None,
    )
    train_audio.main(
        [
            "--train_folder", f"{av_trees}/aud/train",
            "--eval_folder", f"{av_trees}/aud/eval",
            "--checkpoint_dir", ckpt,
            "--hidden_dim", "8", "--batch_size", "3", "--epochs", "1",
            "--eval_every", "1", "--buckets", "10",
            "--compute_dtype", "float32", "--save_resume_state", "false",
        ],
        log=lambda s: None,
    )
    logs = []
    results = test_av_fused.main(
        [
            "--video_folder", f"{av_trees}/faces/test",
            "--audio_folder", f"{av_trees}/aud/test",
            "--visual_ckpt", os.path.join(ckpt, "XceptionLSTMV_ArcFace_Best.npz"),
            "--audio_ckpt", os.path.join(ckpt, "best_model_audio.npz"),
            "--visual_hidden", "8", "--audio_hidden", "8",
            "--batch_size", "2", "--max_frames", "3",
            "--video_buckets", "3", "--audio_buckets", "10",
            "--compute_dtype", "float32",
            "--save_scores", str(tmp_path / "av.npz"),
        ],
        log=logs.append,
    )
    assert set(results) == {"visual", "audio", "fused"}
    assert all("AUC" in m for m in results.values())
    assert any("paired clips: 6" in l for l in logs)
    # batch 2 over the 8-device CPU mesh -> gcd(2,8)=2-device sharded eval
    assert any("sharded AV eval over 2 devices" in l for l in logs)
    z = np.load(tmp_path / "av.npz")
    np.testing.assert_allclose(z["fused"], 0.5 * z["visual"] + 0.5 * z["audio"], atol=1e-6)


def test_paired_dataset_intersection(av_trees, tmp_path):
    import shutil

    lone = tmp_path / "faces_extra"
    shutil.copytree(f"{av_trees}/faces/test", lone)
    np.save(lone / "fake_unpaired.npy", np.zeros((2, 32, 32, 3), np.uint8))
    ds = test_av_fused.PairedAVDataset(str(lone), f"{av_trees}/aud/test")
    assert len(ds) == 6  # the unpaired clip is dropped
