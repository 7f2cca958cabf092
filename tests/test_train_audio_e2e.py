"""End-to-end smoke train of the audio CLI on a synthetic micro-dataset.

The BASELINE.json config-2 path (train_audio + processed-audio npy tree),
CPU-runnable: asserts the loop runs, learns the planted class signal
(train AUC rises above chance), checkpoints the best bundle, and resumes.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.cli.train_audio import Config, build, main
from multimodal_deepfake_detection_tpu.data import make_audio_npy_tree

pytestmark = pytest.mark.slow  # micro-training e2e


@pytest.fixture(scope="module")
def audio_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("aud")
    return make_audio_npy_tree(str(root), n_per_class=4, frames=10)


def _config(audio_tree, tmp_path, **kw):
    return [
        "--train_folder", f"{audio_tree}/train",
        "--eval_folder", f"{audio_tree}/eval",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--hidden_dim", "16",
        "--batch_size", "4",
        "--epochs", kw.pop("epochs", "4"),
        "--eval_every", "2",
        "--buckets", "10",
        "--compute_dtype", "float32",
        "--lr", "3e-4",
    ] + [a for k, v in kw.items() for a in (f"--{k}", v)]


def test_train_audio_smoke(audio_tree, tmp_path):
    logs = []
    history = main(_config(audio_tree, tmp_path), log=logs.append)
    assert len(history) == 4
    assert all(np.isfinite(h.train_loss) for h in history)
    # eval happened on epochs 2 and 4
    assert history[1].eval_loss is not None and history[0].eval_loss is None
    # best bundle exported
    best = os.path.join(str(tmp_path / "ckpt"), "best_model_audio.npz")
    assert os.path.exists(best)
    from multimodal_deepfake_detection_tpu.core.checkpoint import load_bundle

    bundle = load_bundle(best)
    assert "backbone" in bundle["model"] and "lstm" in bundle["model"]
    # resume restores step count
    resume = os.path.join(str(tmp_path / "ckpt"), "train_audio_state.npz")
    assert os.path.exists(resume)
    history2 = main(
        _config(audio_tree, tmp_path, epochs="1") + ["--resume", resume, "--save_resume_state", "false"],
        log=logs.append,
    )
    assert any("resumed" in l for l in logs)


def test_train_audio_learns_signal(audio_tree, tmp_path):
    """The synthetic fakes carry a large MFCC offset; a few epochs must push
    train AUC well above chance (testing the whole grad path end-to-end)."""
    config = Config(
        train_folder=f"{audio_tree}/train",
        eval_folder=f"{audio_tree}/eval",
        checkpoint_dir=str(tmp_path / "c2"),
        hidden_dim=16,
        batch_size=4,
        epochs=1,
        buckets=(10,),
        compute_dtype="float32",
        lr=1e-3,
        freeze_backbone=True,
    )
    train_loader, eval_loader, state, train_step, eval_step = build(config)
    aucs = []
    from multimodal_deepfake_detection_tpu.metrics import compute_eer_auc

    for epoch in range(6):
        probs_all, labels_all = [], []
        for i, (batch, labels, lengths) in enumerate(train_loader):
            state, loss, probs = train_step(state, (batch, labels, lengths), epoch * 100 + i, epoch)
            m = lengths > 0
            probs_all.extend(np.asarray(probs).ravel()[m].tolist())
            labels_all.extend(labels[m].astype(int).tolist())
        auc, *_ = compute_eer_auc(labels_all, probs_all)
        aucs.append(auc)
    assert max(aucs[2:]) > 0.7, f"AUCs {aucs}"


def test_cache_features_equivalence(audio_tree, tmp_path):
    """--cache_features must reproduce the uncached eval-BN quality-mode run
    exactly: same per-epoch losses and same final params after several epochs
    (train/feature_cache.py — the frozen-backbone epoch-time lever)."""
    import jax

    def run(cache):
        config = Config(
            train_folder=f"{audio_tree}/train",
            eval_folder=f"{audio_tree}/eval",
            checkpoint_dir=str(tmp_path / f"cf_{int(cache)}"),
            hidden_dim=16,
            batch_size=4,
            epochs=1,
            buckets=(10,),
            compute_dtype="float32",
            lr=1e-3,
            freeze_backbone=True,
            backbone_bn_eval=True,
            cache_features=cache,
        )
        train_loader, eval_loader, state, train_step, eval_step = build(config)
        losses = []
        for epoch in range(3):
            for i, (batch, labels, lengths) in enumerate(train_loader):
                state, loss, _ = train_step(state, (batch, labels, lengths), epoch * 100 + i, epoch)
                losses.append(float(loss))
        eval_losses, eval_probs = [], []
        for batch, labels, lengths in eval_loader:
            loss, probs = eval_step(state, (batch, labels, lengths))
            eval_losses.append(float(loss))
            eval_probs.append(np.asarray(probs).ravel())
        params = jax.tree_util.tree_map(np.asarray, state.params)
        return losses, eval_losses, np.concatenate(eval_probs), params

    losses_u, ev_u, probs_u, params_u = run(False)
    losses_c, ev_c, probs_c, params_c = run(True)
    np.testing.assert_allclose(losses_c, losses_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ev_c, ev_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(probs_c, probs_u, rtol=1e-5, atol=1e-6)
    flat_u = jax.tree_util.tree_leaves(params_u)
    flat_c = jax.tree_util.tree_leaves(params_c)
    for a, b in zip(flat_c, flat_u):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_cache_features_requires_frozen(audio_tree, tmp_path):
    config = Config(
        train_folder=f"{audio_tree}/train",
        eval_folder=f"{audio_tree}/eval",
        freeze_backbone=False,
        cache_features=True,
    )
    with pytest.raises(ValueError, match="cache_features"):
        build(config)
