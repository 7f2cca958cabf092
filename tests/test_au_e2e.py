"""End-to-end smokes: AU loaders + train/test_au_patch + train/test_au_face."""
import os

import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.cli import (
    test_au_face,
    test_au_patch,
    train_au_face,
    train_au_patch,
)
from multimodal_deepfake_detection_tpu.data import (
    get_joint_dataloader,
    get_patch_image_loaders,
    make_au_patch_tree,
    make_joint_tree,
)

pytestmark = pytest.mark.slow  # micro-training e2e


@pytest.fixture(scope="module")
def patch_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("aup")
    return make_au_patch_tree(str(root), n_per_class=2, frames=3, n_aus=3, size=16)


@pytest.fixture(scope="module")
def joint_tree(tmp_path_factory):
    v = tmp_path_factory.mktemp("jv")
    a = tmp_path_factory.mktemp("ja")
    return make_joint_tree(str(v), str(a), n_per_class=2, frames=3, n_aus=3, face_size=24, patch_size=16)


def test_patch_loaders_contract(patch_tree):
    train_l, test_l, eval_l = get_patch_image_loaders(
        patch_tree, batch_size=2, image_size=0, max_frames=3, max_aus=3, augment_train=True, seed=0
    )
    patches, weights, labels, lengths = next(iter(train_l))
    assert patches.shape == (2, 3, 3, 16, 16, 3)
    assert weights.shape == (2, 3, 3)
    assert patches.max() <= 1.0
    assert hasattr(train_l.dataset, "all_labels")
    # augment_train balances via oversampling: still both classes present
    assert set(train_l.dataset.all_labels) == {0, 1}


def test_joint_loader_contract(joint_tree):
    v, a = joint_tree
    train_l, test_l, eval_l = get_joint_dataloader(
        v, a, batch_size=2, image_size=0, max_frames=3, max_aus=3, return_weights=True, seed=0
    )
    videos, patches, labels, au_mask, au_weight, lengths = next(iter(train_l))
    assert videos.shape == (2, 3, 24, 24, 3)
    assert patches.shape == (2, 3, 3, 16, 16, 3)
    assert au_mask.shape == (2, 3, 3) and au_mask.max() == 1.0
    assert train_l.dataset.all_labels is not None

    train_nw, *_ = get_joint_dataloader(v, a, batch_size=2, image_size=0, max_frames=3, max_aus=3, return_weights=False)
    out = next(iter(train_nw))
    assert len(out) == 4  # (videos, patches, labels, lengths)


def _epoch_aucs(train_loader, state, train_step, n_epochs):
    """Drive train_step over the loader, returning per-epoch train AUC."""
    from multimodal_deepfake_detection_tpu.metrics import compute_eer_auc

    aucs = []
    for epoch in range(n_epochs):
        probs_all, labels_all = [], []
        for i, (batch, labels, lengths) in enumerate(train_loader):
            state, loss, probs = train_step(state, (batch, labels, lengths), epoch * 100 + i, epoch)
            m = lengths > 0
            probs_all.extend(np.asarray(probs).ravel()[m].tolist())
            labels_all.extend(labels[m].astype(int).tolist())
        auc, *_ = compute_eer_auc(labels_all, probs_all)
        aucs.append(auc)
    return aucs


def test_train_au_patch_learns_signal(tmp_path_factory):
    """Synthetic fakes carry a brightness offset; a few epochs of the smooth-BCE
    loop must push train AUC well above chance (whole ResNet-LSTM grad path)."""
    root = tmp_path_factory.mktemp("aup_learn")
    tree = make_au_patch_tree(str(root), n_per_class=4, frames=3, n_aus=3, size=16)
    config = train_au_patch.Config(
        data_root=tree,
        hidden_dim=8,
        lstm_hidden=4,
        batch_size=4,
        max_frames=3,
        max_aus=3,
        image_size=0,
        compute_dtype="float32",
        lr=1e-3,
        augment_train=False,
    )
    train_loader, *_rest, state, train_step, _ = train_au_patch.build(config)
    aucs = _epoch_aucs(train_loader, state, train_step, 6)
    assert max(aucs[2:]) > 0.85, f"AUCs {aucs}"


def test_train_au_face_learns_signal(tmp_path_factory):
    """The AU-face cross-attention loop (ArcFace + CB-Focal + align/temporal
    regularizers, OneCycle) must learn the planted joint-modality signal."""
    v = tmp_path_factory.mktemp("jv_learn")
    a = tmp_path_factory.mktemp("ja_learn")
    v, a = make_joint_tree(str(v), str(a), n_per_class=4, frames=3, n_aus=3, face_size=24, patch_size=16)
    n_epochs = 10
    config = train_au_face.Config(
        video_root=v,
        au_root=a,
        num_aus=3,
        face_dim=16,
        au_dim=16,
        lstm_hidden=8,
        embed_dim=8,
        batch_size=4,
        max_frames=3,
        image_size=0,
        accum_steps=1,
        weighted_sampler=False,
        epochs=n_epochs,
        max_lr=5e-3,
        compute_dtype="float32",
    )
    train_loader, *_rest, state, train_step, _ = train_au_face.build(config)
    aucs = _epoch_aucs(train_loader, state, train_step, n_epochs)
    assert max(aucs[4:]) > 0.85, f"AUCs {aucs}"


def test_train_then_test_au_patch(patch_tree, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    logs = []
    history = train_au_patch.main(
        [
            "--data_root", patch_tree,
            "--checkpoint_dir", ckpt,
            "--hidden_dim", "8",
            "--lstm_hidden", "4",
            "--batch_size", "2",
            "--max_frames", "3",
            "--max_aus", "3",
            "--image_size", "0",
            "--epochs", "2",
            "--compute_dtype", "float32",
            "--save_resume_state", "false",
        ],
        log=logs.append,
    )
    assert len(history) == 2 and all(np.isfinite(h.train_loss) for h in history)
    bundle = os.path.join(ckpt, "best_au_patch_model.npz")
    assert os.path.exists(bundle)

    results = test_au_patch.main(
        [
            "--data_root", patch_tree,
            "--ckpt_path", bundle,
            "--hidden_dim", "8",
            "--lstm_hidden", "4",
            "--batch_size", "2",
            "--max_frames", "3",
            "--max_aus", "3",
            "--image_size", "0",
            "--compute_dtype", "float32",
            "--save_embeddings", str(tmp_path / "emb.npz"),
        ],
        log=logs.append,
    )
    assert "AUC" in results and "thr=0.5" in results
    z = np.load(tmp_path / "emb.npz")
    assert z["embeddings"].shape[1] == 2 * 4


def test_train_then_test_au_face(joint_tree, tmp_path):
    v, a = joint_tree
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "outs")
    logs = []
    history = train_au_face.main(
        [
            "--video_root", v,
            "--au_root", a,
            "--checkpoint_dir", ckpt,
            "--num_aus", "3",
            "--face_dim", "16",
            "--au_dim", "16",
            "--lstm_hidden", "8",
            "--embed_dim", "8",
            "--batch_size", "2",
            "--max_frames", "3",
            "--image_size", "0",
            "--accum_steps", "2",
            "--epochs", "2",
            "--compute_dtype", "float32",
            "--save_resume_state", "false",
            "--adaptive_loss", "true",
            "--tracker", f"tensorboard:{tmp_path / 'tb'}",
        ],
        log=logs.append,
    )
    assert len(history) == 2 and all(np.isfinite(h.train_loss) for h in history)
    # tensorboard sink wrote an event file with the per-epoch scalars
    tb_files = [f for _, _, fs in os.walk(tmp_path / "tb") for f in fs]
    assert any("tfevents" in f for f in tb_files)
    assert any("Class counts" in l for l in logs)
    assert any("Eval@FPR" in l for l in logs)
    bundle = os.path.join(ckpt, "auface_cross_best_auc_arcface_cb.npz")
    assert os.path.exists(bundle)
    from multimodal_deepfake_detection_tpu.core.checkpoint import load_bundle

    b = load_bundle(bundle)
    assert set(b.keys()) >= {"model", "embed", "arcface", "best_auc"}

    results = test_au_face.main(
        [
            "--video_root", v,
            "--au_root", a,
            "--ckpt_path", bundle,
            "--output_dir", out_dir,
            "--num_aus", "3",
            "--face_dim", "16",
            "--au_dim", "16",
            "--lstm_hidden", "8",
            "--batch_size", "2",
            "--max_frames", "3",
            "--image_size", "0",
            "--compute_dtype", "float32",
            "--tsne", "false",
            "--saliency_dir", os.path.join(out_dir, "sal"),
            "--saliency_batches", "1",
        ],
        log=logs.append,
    )
    assert "AUC" in results and "Youden" in results
    assert os.path.exists(os.path.join(out_dir, "scores_and_labels.npz"))
    # Grad-CAM-analog saliency export (jax.grad of the fake score wrt frames)
    assert os.path.exists(os.path.join(out_dir, "sal", "saliency_batch0.png"))
