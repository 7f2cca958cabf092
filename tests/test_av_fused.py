"""Fused AV eval: pairing, sharded scoring, fusion metrics (config 5)."""
import os

import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.cli import test_av_fused, train_audio, train_visual
from multimodal_deepfake_detection_tpu.data import make_audio_npy_tree, make_face_npy_tree

pytestmark = pytest.mark.slow  # full-mesh AV fused eval


@pytest.fixture(scope="module")
def av_trees(tmp_path_factory):
    root = tmp_path_factory.mktemp("av")
    # same stems across both trees ({real,fake}_{i}.npy); 8 paired clips so the
    # AV eval can shard the full 8-device CPU mesh (BASELINE config 5)
    make_face_npy_tree(str(root / "faces"), n_per_class=4, frames=3, size=32)
    make_audio_npy_tree(str(root / "aud"), n_per_class=4, frames=10)
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
    def run(batch_size, scores_name):
        logs = []
        results = test_av_fused.main(
            [
                "--video_folder", f"{av_trees}/faces/test",
                "--audio_folder", f"{av_trees}/aud/test",
                "--visual_ckpt", os.path.join(ckpt, "XceptionLSTMV_ArcFace_Best.npz"),
                "--audio_ckpt", os.path.join(ckpt, "best_model_audio.npz"),
                "--visual_hidden", "8", "--audio_hidden", "8",
                "--batch_size", str(batch_size), "--max_frames", "3",
                "--video_buckets", "3", "--audio_buckets", "10",
                "--compute_dtype", "float32",
                "--save_scores", str(tmp_path / scores_name),
            ],
            log=logs.append,
        )
        return results, logs, np.load(tmp_path / scores_name)

    # batch 8 -> the FULL 8-device CPU mesh (the literal BASELINE config 5:
    # fused AV eval sharded across a TPU slice)
    results, logs, z = run(8, "av8.npz")
    assert set(results) == {"visual", "audio", "fused"}
    assert all("AUC" in m for m in results.values())
    assert any("paired clips: 8" in l for l in logs)
    assert any("sharded AV eval over 8 devices" in l for l in logs)
    np.testing.assert_allclose(z["fused"], 0.5 * z["visual"] + 0.5 * z["audio"], atol=1e-6)

    # batch 1 -> no mesh at all: the 8-way-sharded program must reproduce the
    # single-device per-clip scores exactly (same jit program, XLA collectives)
    _, logs1, z1 = run(1, "av1.npz")
    assert not any("sharded" in l for l in logs1)
    np.testing.assert_array_equal(z["labels"], z1["labels"])
    for key in ("visual", "audio", "fused"):
        np.testing.assert_allclose(z[key], z1[key], rtol=1e-5, atol=1e-6)


def test_paired_dataset_intersection(av_trees, tmp_path):
    import shutil

    lone = tmp_path / "faces_extra"
    shutil.copytree(f"{av_trees}/faces/test", lone)
    np.save(lone / "fake_unpaired.npy", np.zeros((2, 32, 32, 3), np.uint8))
    ds = test_av_fused.PairedAVDataset(str(lone), f"{av_trees}/aud/test")
    assert len(ds) == 8  # the unpaired clip is dropped
