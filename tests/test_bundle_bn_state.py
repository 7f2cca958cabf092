"""Regression: best-model bundles must carry BN running statistics, and the
test CLIs must evaluate with them (not init stats)."""
import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.cli import test_audio, train_audio
from multimodal_deepfake_detection_tpu.core.checkpoint import load_bundle
from multimodal_deepfake_detection_tpu.data import make_audio_npy_tree


def test_bundle_roundtrips_bn_state(tmp_path):
    tree = make_audio_npy_tree(str(tmp_path / "a"), n_per_class=2, frames=8)
    ckpt = str(tmp_path / "ck")
    train_audio.main(
        [
            "--train_folder", f"{tree}/train", "--eval_folder", f"{tree}/eval",
            "--checkpoint_dir", ckpt, "--hidden_dim", "8", "--batch_size", "4",
            "--epochs", "1", "--eval_every", "1", "--buckets", "8",
            "--compute_dtype", "float32", "--save_resume_state", "false",
        ],
        log=lambda s: None,
    )
    bundle = load_bundle(f"{ckpt}/best_model_audio.npz")
    assert "state" in bundle, "bundle must persist BN running statistics"
    bn1_mean = np.asarray(bundle["state"]["backbone"]["bn1"]["mean"])
    assert np.abs(bn1_mean).max() > 0, "training must have moved the running stats"

    logs = []
    test_audio.main(
        [
            "--test_folder", f"{tree}/test", "--ckpt_path", f"{ckpt}/best_model_audio.npz",
            "--hidden_dim", "8", "--batch_size", "4", "--buckets", "8",
            "--compute_dtype", "float32",
        ],
        log=logs.append,
    )
    # no "no BN state" warning — the stats were loaded
    assert not any("no BN state" in l for l in logs)
