"""End-to-end: train_visual (ArcFace) -> bundle -> test_visual eval.

Exercises the freeze->unfreeze transition (two compiled step variants), the
joint best-(loss,EER) checkpoint policy, bundle round-trip into the test CLI,
and the interp metric report with classwise counts — the BASELINE.json
config-1/3 path on a CPU-runnable micro-dataset.
"""
import os

import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.cli import test_visual, train_visual
from multimodal_deepfake_detection_tpu.data import make_face_npy_tree

pytestmark = pytest.mark.slow  # micro-training e2e


@pytest.fixture(scope="module")
def face_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("faces")
    return make_face_npy_tree(str(root), n_per_class=3, frames=3, size=32)


def test_train_then_test_visual(face_tree, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    logs = []
    history = train_visual.main(
        [
            "--train_folder", f"{face_tree}/train",
            "--eval_folder", f"{face_tree}/eval",
            "--checkpoint_dir", ckpt_dir,
            "--hidden_dim", "8",
            "--batch_size", "2",
            "--epochs", "2",
            "--freeze_epochs", "1",
            "--buckets", "3",
            "--compute_dtype", "float32",
            "--save_resume_state", "false",
        ],
        log=logs.append,
    )
    assert len(history) == 2
    assert all(np.isfinite(h.train_loss) for h in history)
    assert any("class counts: real=3 fake=3" in l for l in logs)

    bundle_path = os.path.join(ckpt_dir, "XceptionLSTMV_ArcFace_Best.npz")
    assert os.path.exists(bundle_path)

    results = test_visual.main(
        [
            "--test_folder", f"{face_tree}/test",
            "--ckpt_path", bundle_path,
            "--hidden_dim", "8",
            "--batch_size", "2",
            "--buckets", "3",
            "--compute_dtype", "float32",
            "--save_scores", str(tmp_path / "scores.npz"),
        ],
        log=logs.append,
    )
    for key in ("Accuracy", "AUC", "pAUC", "EER", "ACC@J"):
        assert key in results, key
    assert results["total_real"] == 3 and results["total_fake"] == 3
    z = np.load(tmp_path / "scores.npz")
    assert z["scores"].shape == (6,) and z["labels"].shape == (6,)


def test_train_visual_learns_signal(face_tree, tmp_path):
    """The synthetic fakes carry a brightness offset; a few unfrozen epochs must
    push train AUC well above chance. Guards the whole ArcFace-CE grad path
    (incl. the custom BN VJP) against sign/flow errors that keep loss finite —
    the reference's loop demonstrably converges (train_visual.py:548-643)."""
    config = train_visual.Config(
        train_folder=f"{face_tree}/train",
        eval_folder=f"{face_tree}/eval",
        checkpoint_dir=str(tmp_path / "c3"),
        hidden_dim=8,
        batch_size=3,
        epochs=1,
        freeze_epochs=0,
        buckets=(3,),
        compute_dtype="float32",
        lr=1e-3,
    )
    train_loader, _, state, train_step, _ = train_visual.build(config)
    from multimodal_deepfake_detection_tpu.metrics import compute_eer_auc

    aucs = []
    for epoch in range(6):
        probs_all, labels_all = [], []
        for i, (batch, labels, lengths) in enumerate(train_loader):
            state, loss, probs = train_step(state, (batch, labels, lengths), epoch * 100 + i, epoch)
            m = lengths > 0
            probs_all.extend(np.asarray(probs).ravel()[m].tolist())
            labels_all.extend(labels[m].astype(int).tolist())
        auc, *_ = compute_eer_auc(labels_all, probs_all)
        aucs.append(auc)
    assert max(aucs[2:]) > 0.85, f"AUCs {aucs}"


def test_test_visual_strict_load_rejects_wrong_dim(face_tree, tmp_path):
    """Bundle trained at hidden 8 must fail a strict load into hidden 16."""
    ckpt_dir = str(tmp_path / "c")
    train_visual.main(
        [
            "--train_folder", f"{face_tree}/train",
            "--eval_folder", f"{face_tree}/eval",
            "--checkpoint_dir", ckpt_dir,
            "--hidden_dim", "8",
            "--batch_size", "2",
            "--epochs", "1",
            "--freeze_epochs", "1",
            "--buckets", "3",
            "--compute_dtype", "float32",
            "--save_resume_state", "false",
        ],
        log=lambda s: None,
    )
    with pytest.raises(ValueError, match="shape mismatch"):
        test_visual.build_scorer(
            test_visual.Config(
                ckpt_path=os.path.join(ckpt_dir, "XceptionLSTMV_ArcFace_Best.npz"),
                hidden_dim=16,
                compute_dtype="float32",
            )
        )


def test_visual_cache_features_equivalence(face_tree, tmp_path):
    """--cache_features on train_visual: the frozen-phase epochs served from
    the feature cache (train/feature_cache.py::PhaseSwitchLoader) must
    reproduce the uncached backbone_bn_eval quality-mode run, and the loader
    must switch cleanly to raw frames at the unfreeze boundary.

    Tolerances: the cached path stages the backbone forward in its own jitted
    program, and fp32 program-boundary fusion differences (~1e-5 relative in
    the 2048-d features) are amplified by the ArcFace s=30 margin CE; the
    frozen-phase comparison is therefore 1e-3-level, and post-unfreeze epochs
    (chaotically divergent from that noise) are only sanity-checked."""
    import jax

    def run(cache, epochs):
        config = train_visual.Config(
            train_folder=f"{face_tree}/train",
            eval_folder=f"{face_tree}/eval",
            checkpoint_dir=str(tmp_path / f"vcf_{int(cache)}_{epochs}"),
            hidden_dim=8,
            batch_size=4,
            epochs=1,
            freeze_epochs=3,
            buckets=(6,),
            compute_dtype="float32",
            lr=1e-3,
            shuffle=False,
            backbone_bn_eval=True,
            cache_features=cache,
        )
        train_loader, eval_loader, state, train_step, eval_step = train_visual.build(config)
        losses, eval_losses = [], []
        for epoch in range(epochs):
            for i, (batch, labels, lengths) in enumerate(train_loader):
                state, loss, _ = train_step(state, (batch, labels, lengths), epoch * 100 + i, epoch)
                losses.append(float(loss))
            for batch, labels, lengths in eval_loader:
                loss, _ = eval_step(state, (batch, labels, lengths))
                eval_losses.append(float(loss))
        params = jax.tree_util.tree_map(np.asarray, state.params)
        return losses, eval_losses, params

    # frozen phase: cached vs uncached eval-BN agree to amplified-fp noise
    losses_u, ev_u, params_u = run(False, 3)
    losses_c, ev_c, params_c = run(True, 3)
    np.testing.assert_allclose(losses_c, losses_u, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ev_c, ev_u, rtol=2e-3, atol=2e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_c), jax.tree_util.tree_leaves(params_u)
    ):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)

    # boundary crossing: the cached run continues past the unfreeze epoch on
    # raw frames (loader switch + step switch) with finite losses throughout
    losses_x, ev_x, _ = run(True, 5)
    assert np.all(np.isfinite(losses_x)) and np.all(np.isfinite(ev_x))
    assert len(losses_x) == 10  # 5 epochs x 2 batches: raw phase really ran


def test_visual_cache_features_guards(face_tree):
    with pytest.raises(ValueError, match="freeze_epochs"):
        train_visual.build(train_visual.Config(
            train_folder=f"{face_tree}/train", eval_folder=f"{face_tree}/eval",
            freeze_epochs=0, shuffle=False, cache_features=True,
        ))
    with pytest.raises(ValueError, match="shuffle"):
        train_visual.build(train_visual.Config(
            train_folder=f"{face_tree}/train", eval_folder=f"{face_tree}/eval",
            freeze_epochs=3, shuffle=True, cache_features=True,
        ))
