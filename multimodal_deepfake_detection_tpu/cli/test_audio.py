"""Evaluate an XceptionLSTMA bundle on an MFCC npy tree.

The reference embeds audio evaluation inside train_audio's loop
(``/root/reference/train_audio.py:52-78``: BCE loss + accuracy at 0.5); this
standalone CLI reproduces that scoring (sigmoid outputs, threshold 0.5) and
adds the full metric suite over the accumulated scores.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import load_bundle, merge_params
from ..core.config import parse_config
from ..data import DataLoader, NpyFolderDataset
from ..metrics import compute_eer_auc
from ..models.heads import xception_lstm_features, xception_lstm_head_apply, xception_lstm_init


@dataclasses.dataclass
class Config:
    test_folder: str = "Dataset/processed_audio/test"
    ckpt_path: str = "Checkpoints/best_model_audio.npz"
    hidden_dim: int = 512
    batch_size: int = 8
    buckets: Tuple[int, ...] = (120,)
    compute_dtype: str = "bfloat16"
    mask_padding: bool = True
    seed: int = 0


def main(argv=None, *, test_ds=None, log=print):
    config = parse_config(Config, argv, prog="test_audio")
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    cdtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    test_ds = test_ds or NpyFolderDataset(config.test_folder, kind="audio")
    loader = DataLoader(test_ds, config.batch_size, buckets=config.buckets)

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(config.seed), config.hidden_dim)
    bundle = load_bundle(config.ckpt_path)
    params = merge_params(params, bundle["model"], strict=True)
    if "state" in bundle:
        bn_state = merge_params(bn_state, bundle["state"], strict=False)
    else:
        log("[Load] bundle has no BN state; using initialization statistics")

    @jax.jit
    def score(params, bn_state, batch):
        x, labels, lengths = batch
        feats, _ = xception_lstm_features(params, bn_state, x, mode="audio", train=False, compute_dtype=cdtype)
        return xception_lstm_head_apply(
            params, feats, lengths=lengths, mask_padding=config.mask_padding, compute_dtype=cdtype
        )

    all_probs, all_labels = [], []
    for batch, labels, lengths in loader:
        probs = np.asarray(score(params, bn_state, (batch, labels, lengths)))
        mask = lengths > 0
        all_probs.extend(probs.ravel()[mask].tolist())
        all_labels.extend(labels[mask].astype(int).tolist())

    y = np.asarray(all_labels)
    s = np.asarray(all_probs)
    acc = float(((s > 0.5).astype(int) == y).mean()) if y.size else 0.0
    auc, pauc, eer, _ = compute_eer_auc(y, s)
    log(f"Accuracy: {acc:.4f}\nAUC: {auc:.4f}\npAUC: {pauc:.4f}\nEER: {eer:.4f}")
    return {"Accuracy": acc, "AUC": auc, "pAUC": pauc, "EER": eer}


if __name__ == "__main__":
    main()
