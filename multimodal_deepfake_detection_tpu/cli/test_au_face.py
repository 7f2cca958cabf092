"""Evaluate a cross-modal face+AU bundle: metrics, score dump, t-SNE plots.

TPU-native re-design of ``/root/reference/test_au_face.py`` (the fully-live
reference file): flexible checkpoint loading (container unwrap + non-strict
fallback, ``:107-141``), feature collection of mean face/AU tokens and
sigmoid scores from the model's own logits head (``:147-184``), automatic
score sign-flip when AUC(1-s) > AUC(s) (``:294-301``), split fallback
eval<->test when one is empty (``:263-282``), AUC/pAUC/EER plus Youden and
FPR<=5% operating points (``:303-316``), a ``scores_and_labels.npz`` dump
(``:319-322``), and t-SNE plots of the face / AU / concat streams
(``:325-340``).
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
from ..data.au_patches import get_joint_dataloader
from ..metrics import compute_acc_ap_and_counts, compute_eer_auc, pick_threshold
from ..models.au_face import au_face_detector_apply, au_face_detector_init
from ..utils.visualize import run_tsne_and_plot


@dataclasses.dataclass
class Config:
    """test_au_face configuration (defaults = the reference's caps block,
    test_au_face.py:17-53)."""

    video_root: str = "Dataset/FAVC_frames"
    au_root: str = "Dataset/AU_Files/fakeavceleb_whole_image_patches"
    ckpt_path: str = "Checkpoints/auface_cross_best_auc_arcface_cb.npz"
    output_dir: str = "eval_outputs"
    split: str = "eval"  # 'eval' | 'test' (with empty-split fallback)
    num_aus: int = 17
    face_dim: int = 512
    au_dim: int = 512
    lstm_hidden: int = 256
    batch_size: int = 2
    image_size: int = 128
    max_frames: int = 75
    # metadata label/split sources (/root/reference/test_au_face.py:236-260)
    csv_path: Optional[str] = None
    lavdf_mode: bool = False
    lavdf_json_path: Optional[str] = None
    num_workers: int = 0
    buckets: Tuple[int, ...] = ()
    compute_dtype: str = "bfloat16"
    strict_load: bool = True  # falls back to non-strict on failure
    allow_sign_flip: bool = True
    fpr_target: float = 0.05
    tsne: bool = True
    tsne_max_samples: int = 2000
    # input-gradient saliency PNGs (the Grad-CAM analog of the reference's
    # phantom EVM_AU_GradCAM_Model, /root/reference/train_au_face.py:54)
    saliency_dir: Optional[str] = None
    saliency_batches: int = 1
    seed: int = 42


def load_detector_flexible(config: Config, log=print):
    params, bn_state = au_face_detector_init(
        jax.random.PRNGKey(config.seed),
        num_aus=config.num_aus,
        face_dim=config.face_dim,
        au_dim=config.au_dim,
        lstm_hidden=config.lstm_hidden,
    )
    bundle = load_bundle(config.ckpt_path)
    # container unwrap: accept {model: ...} or a bare tree
    tree = bundle.get("model", bundle)
    try:
        params = merge_params(params, tree, strict=config.strict_load)
        log(f"[Load] {config.ckpt_path} ok (strict={config.strict_load})")
    except (KeyError, ValueError) as e:
        log(f"[Load] strict failed -> {type(e).__name__}: {e}")
        params = merge_params(params, tree, strict=False)
        log("[Load] non-strict fallback applied")
    if isinstance(bundle, dict) and "state" in bundle:
        bn_state = merge_params(bn_state, bundle["state"], strict=False)
    return params, bn_state


def collect_features(loader, params, bn_state, *, compute_dtype, log=print):
    """Returns (feats_face, feats_au, labels, scores) — test_au_face.py:147-184."""

    @jax.jit
    def run(params, bn_state, videos, patches, au_mask, au_weight):
        logits, v_tokens, au_tokens, _ = au_face_detector_apply(
            params, bn_state, videos, patches, au_mask, au_weight,
            train=False, compute_dtype=compute_dtype,
        )
        probs = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
        return probs, jnp.mean(v_tokens.astype(jnp.float32), 1), jnp.mean(au_tokens.astype(jnp.float32), 1)

    all_face, all_au, all_lab, all_score = [], [], [], []
    for videos, patches, labels, au_mask, au_weight, lengths in loader:
        probs, face_mu, au_mu = run(params, bn_state, videos, patches, au_mask, au_weight)
        mask = lengths > 0
        all_face.append(np.asarray(face_mu)[mask])
        all_au.append(np.asarray(au_mu)[mask])
        all_lab.append(labels[mask].astype(int))
        all_score.append(np.asarray(probs)[mask])
    cat = lambda xs, d: np.concatenate(xs, 0) if xs else np.zeros((0, d))
    return (
        cat(all_face, 1),
        cat(all_au, 1),
        cat(all_lab, 1).reshape(-1) if all_lab else np.zeros((0,), int),
        cat(all_score, 1).reshape(-1) if all_score else np.zeros((0,)),
    )


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="test_au_face")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(config.output_dir, exist_ok=True)
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32

    _train, test_l, eval_l = get_joint_dataloader(
        config.video_root,
        config.au_root,
        csv_path=config.csv_path,
        lavdf_mode=config.lavdf_mode,
        lavdf_json_path=config.lavdf_json_path,
        num_workers=config.num_workers,
        batch_size=config.batch_size,
        shuffle=False,
        max_frames=config.max_frames,
        max_aus=config.num_aus,
        image_size=config.image_size,
        buckets=config.buckets or None,
        return_weights=True,
        seed=config.seed,
    )
    loaders = {"eval": eval_l, "test": test_l}
    loader = loaders[config.split]
    if len(loader.dataset) == 0:  # empty-split fallback (test_au_face.py:274-281)
        other = "test" if config.split == "eval" else "eval"
        log(f"[Data] split '{config.split}' empty; falling back to '{other}'")
        loader = loaders[other]

    params, bn_state = load_detector_flexible(config, log)
    feats_face, feats_au, labels, scores = collect_features(
        loader, params, bn_state, compute_dtype=cdtype, log=log
    )

    if labels.size and len(np.unique(labels)) >= 2 and config.allow_sign_flip:
        auc_pos, *_ = compute_eer_auc(labels, scores)
        auc_neg, *_ = compute_eer_auc(labels, 1.0 - scores)
        if auc_neg > auc_pos:
            log(f"[Scores] sign auto-flip: AUC(1-s)={auc_neg:.4f} > AUC(s)={auc_pos:.4f}")
            scores = 1.0 - scores

    auc, pauc, eer, _ = compute_eer_auc(labels, scores)
    log(f"AUC: {auc:.4f}  pAUC@0.1: {pauc:.4f}  EER: {eer:.4f}")
    results = {"AUC": auc, "pAUC": pauc, "EER": eer}
    for mode, target in (("youden", None), ("fpr", config.fpr_target)):
        thr, fpr, tpr = pick_threshold(labels, scores, mode=mode, fpr_target=target or 0.01)
        acc, ap, cr, tr, cf, tf = compute_acc_ap_and_counts(labels, scores, thr)
        tag = "Youden" if mode == "youden" else f"FPR<={target:.0%}"
        results[tag] = {"acc": acc, "ap": ap, "thr": thr, "fpr": fpr, "tpr": tpr}
        log(
            f"[{tag}] Acc={acc:.4f} AP={ap:.4f} thr={thr:.3f} FPR={fpr:.3f} TPR={tpr:.3f} "
            f"Real {cr}/{tr} Fake {cf}/{tf}"
        )

    npz_path = os.path.join(config.output_dir, "scores_and_labels.npz")
    np.savez(npz_path, scores=scores, labels=labels)
    log(f"saved -> {npz_path}")

    if config.tsne and labels.size:
        for X, name in (
            (feats_face, "face_stream"),
            (feats_au, "au_stream"),
            (np.concatenate([feats_face, feats_au], axis=1), "concat_streams"),
        ):
            run_tsne_and_plot(
                X, labels, f"t-SNE {name}",
                os.path.join(config.output_dir, f"tsne_{name}.png"),
                seed=config.seed, max_samples=config.tsne_max_samples, log=log,
            )

    if config.saliency_dir:
        export_saliency(config, loader, params, bn_state, cdtype, log=log)
    return results


def export_saliency(config: Config, loader, params, bn_state, cdtype, *, log=print):
    """Input-gradient saliency PNGs for the first N batches (Grad-CAM analog)."""
    from ..utils.saliency import input_saliency, save_saliency_grid

    @jax.jit
    def sal_fn(params, bn_state, videos, patches, au_mask, au_weight):
        def score(v, p, m, w):
            logits, *_ = au_face_detector_apply(
                params, bn_state, v, p, m, w, train=False, compute_dtype=cdtype
            )
            return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))

        return input_saliency(score, videos, patches, au_mask, au_weight), score(
            videos, patches, au_mask, au_weight
        )

    for b, (videos, patches, labels, au_mask, au_weight, lengths) in enumerate(loader):
        if b >= config.saliency_batches:
            break
        sal, probs = sal_fn(params, bn_state, videos, patches, au_mask, au_weight)
        save_saliency_grid(
            videos, np.asarray(sal),
            os.path.join(config.saliency_dir, f"saliency_batch{b}.png"),
            scores=np.asarray(probs), labels=labels, log=log,
        )


if __name__ == "__main__":
    main()
