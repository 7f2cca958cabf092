"""Orbax checkpoint manager: save/restore round trip, rolling retention,
empty-dir behavior — the preemption-safe resume path (SURVEY §5)."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.core.orbax_ckpt import OrbaxStateManager
from multimodal_deepfake_detection_tpu.train import TrainState, make_optimizer


def _state(v):
    tx = make_optimizer("adam", 1e-3)
    params = {"w": jnp.full((4,), float(v)), "nested": {"b": jnp.arange(3.0)}}
    return TrainState(jnp.asarray(v), params, {"bn": jnp.zeros(2)}, tx.init(params), None)


def test_roundtrip_and_retention(tmp_path):
    mgr = OrbaxStateManager(str(tmp_path / "ck"), max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(step, _state(step))
    assert mgr.latest_step() == 3

    restored = mgr.restore_latest(like=_state(0))
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.full(4, 3.0))
    np.testing.assert_array_equal(np.asarray(restored.params["nested"]["b"]), np.arange(3.0))

    # rolling retention: only the last 2 steps survive
    import os

    kept = sorted(d for d in os.listdir(tmp_path / "ck") if d.isdigit())
    assert kept == ["2", "3"]
    mgr.close()


def test_train_audio_orbax_backend_and_auto_resume(tmp_path):
    from multimodal_deepfake_detection_tpu.cli.train_audio import main
    from multimodal_deepfake_detection_tpu.data import make_audio_npy_tree

    tree = make_audio_npy_tree(str(tmp_path / "a"), n_per_class=2, frames=8)
    ck = str(tmp_path / "ck")
    args = [
        "--train_folder", f"{tree}/train", "--eval_folder", f"{tree}/eval",
        "--checkpoint_dir", ck, "--hidden_dim", "8", "--batch_size", "4",
        "--epochs", "2", "--eval_every", "1", "--buckets", "8",
        "--compute_dtype", "float32", "--ckpt_backend", "orbax",
    ]
    main(args, log=lambda s: None)
    import os

    assert sorted(d for d in os.listdir(os.path.join(ck, "train_audio_orbax")) if d.isdigit()) == ["1", "2"]
    logs = []
    main(args + ["--epochs", "1", "--resume", "auto"], log=logs.append)
    assert any("resumed from orbax step 2" in l for l in logs)


def test_empty_directory_returns_none(tmp_path):
    mgr = OrbaxStateManager(str(tmp_path / "empty"))
    assert mgr.latest_step() is None
    assert mgr.restore_latest(like=_state(0)) is None
    mgr.close()
