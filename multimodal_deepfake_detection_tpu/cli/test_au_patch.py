"""Evaluate an AU-patch classifier bundle at three operating points.

TPU-native re-design of the live tail of
``/root/reference/test_au_patch.py:396-504``: clean test loader, strict
checkpoint load, plain sigmoid scores, global AUC/pAUC/EER, then accuracy and
per-class counts at three thresholds — fixed 0.5, EER-optimal, and Youden-J
(``test_au_patch.py:481-504``). Optionally exports the pooled pre-classifier
embeddings for t-SNE (the dead variant's tap, ``test_au_patch.py:266-289``).
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
from ..data.au_patches import get_patch_image_loaders
from ..metrics import compute_eer_auc, pick_threshold, roc_curve
from ..models.resnet_lstm import au_patch_classifier_apply, au_patch_classifier_init


@dataclasses.dataclass
class Config:
    data_root: str = "Dataset/AU_Files/fakeavceleb_whole_image_patches"
    # metadata label/split sources (/root/reference/test_au_patch.py:438-449)
    mode: str = "fakeavceleb"
    csv_path: Optional[str] = None
    lavdf_json: Optional[str] = None
    include_unmatched_real: bool = False
    unmatched_split_seed: int = 42
    num_workers: int = 0
    ckpt_path: str = "Checkpoints/best_au_patch_model.npz"
    hidden_dim: int = 128
    lstm_hidden: int = 128
    batch_size: int = 2
    image_size: int = 128
    max_frames: int = 60
    max_aus: int = 17
    buckets: Tuple[int, ...] = ()
    compute_dtype: str = "bfloat16"
    mask_padding: bool = True
    seed: int = 0
    save_embeddings: Optional[str] = None  # npz of pooled embeddings + labels
    # input-gradient saliency PNGs for the first N batches (same export as
    # cli/test_au_face.py's --saliency_dir; the AU axis is unrolled into the
    # frame grid so each AU patch gets its own attribution tile)
    saliency_dir: Optional[str] = None
    saliency_batches: int = 1


def _counts_at(y, s, thr):
    preds = (s >= thr).astype(int)
    return {
        "acc": float((preds == y).mean()),
        "correct_real": int(((preds == 0) & (y == 0)).sum()),
        "total_real": int((y == 0).sum()),
        "correct_fake": int(((preds == 1) & (y == 1)).sum()),
        "total_fake": int((y == 1).sum()),
    }


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="test_au_patch")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    _train, test_l, _eval = get_patch_image_loaders(
        config.data_root,
        mode=config.mode,
        csv_path=config.csv_path,
        lavdf_json=config.lavdf_json,
        include_unmatched_real=config.include_unmatched_real,
        unmatched_split_seed=config.unmatched_split_seed,
        num_workers=config.num_workers,
        batch_size=config.batch_size,
        image_size=config.image_size,
        max_frames=config.max_frames,
        max_aus=config.max_aus,
        buckets=config.buckets or None,
        augment_train=False,
        augment_eval=False,
        augment_test=False,
        seed=config.seed,
    )

    params, bn_state = au_patch_classifier_init(
        jax.random.PRNGKey(config.seed), hidden_dim=config.hidden_dim, lstm_hidden=config.lstm_hidden
    )
    bundle = load_bundle(config.ckpt_path)
    params = merge_params(params, bundle["model"], strict=True)
    if "state" in bundle:
        bn_state = merge_params(bn_state, bundle["state"], strict=False)
    else:
        log("[Load] bundle has no BN state; using initialization statistics")

    @jax.jit
    def score(params, bn_state, patches, weights, lengths):
        logits, _ = au_patch_classifier_apply(
            params,
            bn_state,
            patches,
            weights,
            lengths=lengths, mask_padding=config.mask_padding,
            train=False,
            compute_dtype=cdtype,
        )
        return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))

    @jax.jit
    def embed(params, bn_state, patches, weights, lengths):
        pooled, _ = au_patch_classifier_apply(
            params, bn_state, patches, weights,
            lengths=lengths, mask_padding=config.mask_padding,
            train=False, compute_dtype=cdtype, return_pooled=True,
        )
        return pooled

    all_s, all_y, all_emb = [], [], []
    for patches, weights, labels, lengths in test_l:
        mask = lengths > 0
        s = np.asarray(score(params, bn_state, patches, weights, lengths))
        all_s.extend(s[mask].tolist())
        all_y.extend(labels[mask].astype(int).tolist())
        if config.save_embeddings:
            e = np.asarray(embed(params, bn_state, patches, weights, lengths))
            all_emb.extend(e[mask].tolist())

    y = np.asarray(all_y)
    s = np.asarray(all_s)
    auc, pauc, eer, _ = compute_eer_auc(y, s)
    log(f"AUC: {auc:.4f}  pAUC: {pauc:.4f}  EER: {eer:.4f}")

    # EER-optimal threshold: ROC point nearest the fpr=fnr crossing
    fpr, tpr, thr = roc_curve(y, s, drop_intermediate=False)
    eer_thr = float(thr[int(np.nanargmin(np.abs(fpr - (1 - tpr))))])
    youden_thr, _, _ = pick_threshold(y, s, mode="youden")

    results = {"AUC": auc, "pAUC": pauc, "EER": eer}
    for name, t in (("thr=0.5", 0.5), (f"thr=EER({eer_thr:.3f})", eer_thr), (f"thr=Youden({youden_thr:.3f})", youden_thr)):
        c = _counts_at(y, s, t)
        results[name] = c
        log(
            f"[{name}] Acc={c['acc']:.4f} Real {c['correct_real']}/{c['total_real']} "
            f"Fake {c['correct_fake']}/{c['total_fake']}"
        )
    if config.save_embeddings:
        os.makedirs(os.path.dirname(os.path.abspath(config.save_embeddings)), exist_ok=True)
        np.savez(config.save_embeddings, embeddings=np.asarray(all_emb), labels=y, scores=s)
        log(f"saved embeddings -> {config.save_embeddings}")
    if config.saliency_dir:
        export_saliency(config, test_l, params, bn_state, cdtype, log=log)
    return results


def export_saliency(config: Config, loader, params, bn_state, cdtype, *, log=print):
    """Input-gradient saliency PNGs for the first N batches (Grad-CAM analog)."""
    from ..utils.saliency import input_saliency, save_saliency_grid

    @jax.jit
    def sal_fn(params, bn_state, patches, weights, lengths):
        def probs(p):
            logits, _ = au_patch_classifier_apply(
                params, bn_state, p, weights,
                lengths=lengths, mask_padding=config.mask_padding,
                train=False, compute_dtype=cdtype,
            )
            return jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))

        return input_saliency(probs, patches), probs(patches)

    for b, (patches, weights, labels, lengths) in enumerate(loader):
        if b >= config.saliency_batches:
            break
        sal, probs = sal_fn(params, bn_state, patches, weights, lengths)
        # unroll the AU axis into the frame grid: (B,T,A,h,w[,3]) -> (B,T*A,h,w[,3])
        B, T, A = patches.shape[:3]
        save_saliency_grid(
            patches.reshape((B, T * A) + patches.shape[3:]),
            np.asarray(sal).reshape((B, T * A) + sal.shape[3:]),
            os.path.join(config.saliency_dir, f"saliency_batch{b}.png"),
            scores=np.asarray(probs), labels=labels, log=log,
        )


if __name__ == "__main__":
    main()
