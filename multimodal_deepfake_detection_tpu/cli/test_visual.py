"""Evaluate an XceptionLSTMV+ArcFace bundle on a face npy tree.

TPU-native re-design of the live FakeAVCeleb eval of
``/root/reference/test_visual.py:454-651``: loads the ``{model, arcface}``
bundle, scores with label-free ArcFace logits -> softmax[:, 1], and reports
the interpolated metric variant (normalized pAUC@0.1 with 0 = random,
interpolated-crossing EER, ACC@Youden) plus overall accuracy at 0.5 and
per-class correct counts. Batched, jitted, bf16; optionally dumps scores to
``scores_and_labels.npz`` (the test_au_face.py:319-322 export contract).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import load_bundle, merge_params
from ..core.config import parse_config
from ..data import DataLoader, NpyFolderDataset
from ..metrics import compute_metrics_interp
from ..models.heads import (
    arcface_apply,
    arcface_init,
    xception_lstm_embed,
    xception_lstm_features,
    xception_lstm_init,
)
from ..parallel import auto_data_mesh, replicate, shard_batch


@dataclasses.dataclass
class Config:
    """test_visual configuration (defaults = reference test loop)."""

    test_folder: str = "Dataset/processed/test"
    ckpt_path: str = "Checkpoints/XceptionLSTMV_ArcFace_Best.npz"
    # dataset mode: 'npy' or D2 metadata modes ('fakeavceleb' w/ csv_path —
    # the reference test loop's config, test_visual.py:578-590)
    mode: str = "npy"
    subset: str = "test"
    csv_path: Optional[str] = None
    lavdf_json: Optional[str] = None
    frame_size: Tuple[int, int] = (224, 224)
    hidden_dim: int = 128
    arcface_s: float = 30.0
    batch_size: int = 4
    max_frames: int = 75
    buckets: Tuple[int, ...] = (25, 50, 75)
    compute_dtype: str = "bfloat16"
    mask_padding: bool = True
    strict_load: bool = True
    save_scores: Optional[str] = None  # path for scores_and_labels.npz
    # input-gradient saliency PNGs for the first N batches (same export as
    # cli/test_au_face.py's --saliency_dir)
    saliency_dir: Optional[str] = None
    saliency_batches: int = 1
    seed: int = 0


def build_scorer(config: Config):
    """Returns (state=(params, bn_state), score_fn(batch)->probs)."""
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(config.seed)
    r1, r2 = jax.random.split(rng)
    params, bn_state = xception_lstm_init(r1, config.hidden_dim)
    params["arcface"] = arcface_init(r2, config.hidden_dim, 2)

    bundle = load_bundle(config.ckpt_path)
    model_params = {k: v for k, v in params.items() if k != "arcface"}
    model_params = merge_params(model_params, bundle["model"], strict=config.strict_load)
    params = dict(model_params, arcface=merge_params(params["arcface"], bundle["arcface"], strict=config.strict_load))
    if "state" in bundle:
        bn_state = merge_params(bn_state, bundle["state"], strict=False)

    mesh = auto_data_mesh(config.batch_size)
    if mesh is not None:
        params = replicate(mesh, params)
        bn_state = replicate(mesh, bn_state)

    @jax.jit
    def score(params, bn_state, batch):
        video, labels, lengths = batch
        feats, _ = xception_lstm_features(
            params, bn_state, video, mode="video", train=False, compute_dtype=cdtype
        )
        emb = xception_lstm_embed(
            params, feats, lengths=lengths, mask_padding=config.mask_padding, compute_dtype=cdtype
        )
        logits = arcface_apply(params["arcface"], emb, None, s=config.arcface_s)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    def score_fn(batch):
        batch = shard_batch(mesh, batch) if mesh is not None else batch
        return score(params, bn_state, batch)

    # expose the scorer state for saliency export without changing the
    # (batch) -> probs calling contract the tests pin
    score_fn.params, score_fn.bn_state, score_fn.cdtype = params, bn_state, cdtype
    return score_fn


def export_saliency(config: Config, loader, score_fn, *, log=print):
    """Input-gradient saliency PNGs for the first N batches (Grad-CAM analog,
    the same export cli/test_au_face.py wires behind --saliency_dir)."""
    from ..utils.saliency import input_saliency, save_saliency_grid

    params, bn_state, cdtype = score_fn.params, score_fn.bn_state, score_fn.cdtype

    @jax.jit
    def sal_fn(params, bn_state, video, lengths):
        def probs(v):
            feats, _ = xception_lstm_features(
                params, bn_state, v, mode="video", train=False, compute_dtype=cdtype
            )
            emb = xception_lstm_embed(
                params, feats, lengths=lengths, mask_padding=config.mask_padding,
                compute_dtype=cdtype,
            )
            logits = arcface_apply(params["arcface"], emb, None, s=config.arcface_s)
            return jax.nn.softmax(logits, axis=-1)[:, 1]

        return input_saliency(probs, video), probs(video)

    for b, (video, labels, lengths) in enumerate(loader):
        if b >= config.saliency_batches:
            break
        sal, probs = sal_fn(params, bn_state, video, lengths)
        save_saliency_grid(
            video, np.asarray(sal),
            os.path.join(config.saliency_dir, f"saliency_batch{b}.png"),
            scores=np.asarray(probs), labels=labels, log=log,
        )


def evaluate(score_fn, loader, *, log=print):
    all_probs, all_labels = [], []
    for batch, labels, lengths in loader:
        probs = np.asarray(score_fn((batch, labels, lengths)))
        mask = lengths > 0
        all_probs.extend(probs.ravel()[mask].tolist())
        all_labels.extend(labels[mask].astype(int).tolist())
    y = np.asarray(all_labels)
    s = np.asarray(all_probs)
    preds = (s > 0.5).astype(int)
    results = {
        "Accuracy": float((preds == y).mean()) if y.size else 0.0,
        **compute_metrics_interp(y, s),
        "correct_real": int(((preds == 0) & (y == 0)).sum()),
        "total_real": int((y == 0).sum()),
        "correct_fake": int(((preds == 1) & (y == 1)).sum()),
        "total_fake": int((y == 1).sum()),
    }
    return results, y, s


def main(argv=None, *, test_ds=None, log=print):
    config = parse_config(Config, argv, prog="test_visual")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    if config.mode != "npy" and test_ds is None:
        from ..data.video_enhanced import get_face_dataloader

        loader = get_face_dataloader(
            config.test_folder,
            mode=config.mode,
            subset=config.subset,
            csv_path=config.csv_path,
            lavdf_json=config.lavdf_json,
            batch_size=config.batch_size,
            frame_size=tuple(config.frame_size),
            max_frames=config.max_frames,
            buckets=config.buckets,
            seed=config.seed,
        )
    else:
        test_ds = test_ds or NpyFolderDataset(config.test_folder, kind="video", max_frames=config.max_frames)
        loader = DataLoader(test_ds, config.batch_size, buckets=config.buckets)
    score_fn = build_scorer(config)
    results, y, s = evaluate(score_fn, loader, log=log)

    log("\n=== Test Results ===")
    for k in ("Accuracy", "AUC", "AP", "pAUC", "EER", "ACC@J", "THR@J"):
        if k in results:
            log(f"{k}: {results[k]:.4f}")
    log(
        f"Classwise: Real {results['correct_real']}/{results['total_real']}, "
        f"Fake {results['correct_fake']}/{results['total_fake']}"
    )
    if config.save_scores:
        os.makedirs(os.path.dirname(os.path.abspath(config.save_scores)), exist_ok=True)
        np.savez(config.save_scores, scores=s, labels=y)
        log(f"saved scores -> {config.save_scores}")
    if config.saliency_dir:
        export_saliency(config, loader, score_fn, log=log)
    return results


if __name__ == "__main__":
    main()
