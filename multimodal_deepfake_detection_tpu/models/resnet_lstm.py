"""AU-patch classifier with per-AU attention ("ResNetLSTM" / phantom D5).

Reconstruction of ``Models.ResNetLSTM.AUPatchResNetClassifierWithAUAttention``
— absent from the reference repo; its internals are pinned by the dead
embedding extractor at ``/root/reference/test_au_patch.py:267-289``:

    per-patch ResNet features -> au_fc -> (B, T, A, hidden)
    attn scores -> softmax over the AU axis
    optionally blended with external per-patch weights (renormalized, +1e-6)
    attended sum over A -> (B, T, hidden)
    bidirectional LSTM -> (B, T, 2*lstm_hidden) -> mean over T -> classifier

and the ctor signature ``(hidden_dim=128, lstm_hidden=128)`` at
``train_au_patch.py:199``. TPU shape discipline: all (B, T, A) axes flatten
into one backbone batch; attention/LSTM run on dense (B, T, ...) tensors with
optional length masking for padded batches.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import linear, linear_init
from ..ops.lstm import bilstm_apply, bilstm_init
from .resnet import FEATURE_DIM, resnet18_apply, resnet18_init


def au_patch_classifier_init(rng, *, hidden_dim: int = 128, lstm_hidden: int = 128, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    backbone_p, backbone_s = resnet18_init(k1, dtype=dtype)
    params = {
        "backbone": backbone_p,
        "au_fc": linear_init(k2, FEATURE_DIM, hidden_dim, dtype=dtype),
        "attn": linear_init(k3, hidden_dim, 1, dtype=dtype),
        "lstm": bilstm_init(k4, hidden_dim, lstm_hidden, dtype=dtype),
        "classifier": linear_init(k5, 2 * lstm_hidden, 1, dtype=dtype),
    }
    return params, {"backbone": backbone_s}


def au_patch_classifier_apply(
    params,
    state,
    patches: jnp.ndarray,
    au_patch_weights: Optional[jnp.ndarray] = None,
    *,
    lengths: Optional[jnp.ndarray] = None,
    mask_padding: bool = True,
    train: bool = False,
    compute_dtype=None,
    return_pooled: bool = False,
    backbone_fn=None,
) -> Tuple[jnp.ndarray, dict]:
    """patches (B, T, A, H, W, 3), weights (B, T, A) -> logits (B, 1).

    ``backbone_fn`` (flat (N, H, W, 3) -> (N, 512)) overrides the stock
    eval-mode ResNet-18 — the w8a8 quantized serving path
    (models/quant.py::resnet18_quant_walk) plugs in here.

    With ``lengths``, ``mask_padding=True`` (quality mode) masks each sample's
    temporal mean-pool at its own length AND gates the biLSTM state per sample,
    so padding (to any bucket width) is fully inert. ``mask_padding=False`` (fidelity
    mode) reproduces the reference's pad-to-batch-max forward exactly even
    under bucketed collate: the biLSTM's backward scan is state-gated at
    ``max(lengths)`` and the mean-pool runs over ``t < max(lengths)`` for
    every sample (the reference mean-pools padded rows too,
    ``/root/reference/test_au_patch.py:287-293``). ``lengths=None`` is the
    raw full-bucket forward (exact only when bucket == batch max length).
    ``return_pooled`` exposes the (B, 2*lstm_hidden) pre-classifier embedding
    (the t-SNE export tap, ``test_au_patch.py:287-289``).
    """
    B, T, A = patches.shape[:3]
    flat = patches.reshape((B * T * A,) + patches.shape[3:])
    if backbone_fn is not None:
        feats, new_bstate = backbone_fn(flat), state["backbone"]
    else:
        feats, new_bstate = resnet18_apply(
            params["backbone"], state["backbone"], flat, train=train, compute_dtype=compute_dtype
        )
    feats = linear(params["au_fc"], feats, compute_dtype=compute_dtype)
    feats = feats.reshape(B, T, A, -1)

    attn_scores = linear(params["attn"], feats, compute_dtype=compute_dtype)  # (B,T,A,1)
    attn = jax.nn.softmax(attn_scores.astype(jnp.float32), axis=2)
    if au_patch_weights is not None:
        combined = attn * au_patch_weights[..., None].astype(jnp.float32)
        attn = combined / (jnp.sum(combined, axis=2, keepdims=True) + 1e-6)
    attended = jnp.sum(attn.astype(feats.dtype) * feats, axis=2)  # (B,T,hidden)

    if lengths is None:
        valid_T = None
    elif mask_padding:
        # quality mode: per-sample gate — padding is fully inert (the backward
        # scan starts at each row's own length), so scores are invariant to
        # the bucket width the serving/collate path padded to
        valid_T = lengths
    else:
        # fidelity mode: the reference's pad-to-batch-max forward
        valid_T = jnp.max(lengths)
    lstm_out = bilstm_apply(params["lstm"], attended, compute_dtype=compute_dtype, valid_T=valid_T)
    if lengths is None:
        pooled = jnp.mean(lstm_out.astype(jnp.float32), axis=1)
    else:
        per_sample = lengths[:, None] if mask_padding else jnp.max(lengths)[None, None]
        mask = (jnp.arange(T)[None, :] < per_sample).astype(jnp.float32)
        pooled = jnp.sum(lstm_out.astype(jnp.float32) * mask[..., None], axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1.0
        )
    if return_pooled:
        return pooled, {"backbone": new_bstate}
    logits = linear(params["classifier"], pooled.astype(attended.dtype), compute_dtype=compute_dtype)
    return logits, {"backbone": new_bstate}
