"""Temporal heads and metric-learning heads.

Covers the reference's model zoo around the Xception backbone:

* ``XceptionLSTMV`` — video head: frozen backbone per-frame features ->
  LSTM(2048 -> hidden) -> 4x(Linear-1024 + ReLU + Dropout 0.3) -> Linear(1) ->
  sigmoid (``/root/reference/XceptionLSTMV.py:9-70``).
* ``XceptionLSTMA`` — audio head: each (3, 13) MFCC step bilinear-resized to
  64x64, then the identical skeleton (``/root/reference/XceptionLSTMA.py:5-59``).
* ``ArcFaceHead`` — additive-angular-margin classifier
  (``/root/reference/train_visual.py:455-474``, m=0.5 visual / m=0.30 AU-face).
* embed head — pooled-token -> 256 -> 128 projection for ArcFace on the
  cross-modal detector (``/root/reference/train_au_face.py:598-603``).

TPU shape discipline: the (B, T) axes are flattened into one big batch before
the backbone so the convolutions present a single large batch to the MXU, and
the LSTM input projection runs as one (B*T, 2048) x (2048, 4H) matmul.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.precision import at_least_f32
from ..ops.conv import linear, linear_init
from ..ops.lstm import lstm_apply, lstm_init, select_last_step
from ..ops.resize import resize_bilinear
from .xception import xception_apply, xception_init

MLP_WIDTH = 1024
FEATURE_DIM = 2048


# ---------------------------------------------------------------------------
# XceptionLSTM (shared video/audio skeleton)
# ---------------------------------------------------------------------------

def xception_lstm_init(rng, hidden_dim: int, *, dtype=jnp.float32):
    """Params/state for the XceptionLSTM{V,A} skeleton (mode-agnostic)."""
    keys = jax.random.split(rng, 7)
    backbone_params, backbone_state = xception_init(keys[0], num_classes=None, dtype=dtype)
    params = {
        "backbone": backbone_params,
        "lstm": lstm_init(keys[1], FEATURE_DIM, hidden_dim, dtype=dtype),
        "fc_layers": [
            linear_init(keys[2], hidden_dim, MLP_WIDTH, dtype=dtype),
            linear_init(keys[3], MLP_WIDTH, MLP_WIDTH, dtype=dtype),
            linear_init(keys[4], MLP_WIDTH, MLP_WIDTH, dtype=dtype),
            linear_init(keys[5], MLP_WIDTH, MLP_WIDTH, dtype=dtype),
        ],
        "fc_out": linear_init(keys[6], MLP_WIDTH, 1, dtype=dtype),
    }
    state = {"backbone": backbone_state}
    return params, state


def xception_lstm_features(
    params,
    state,
    batch: jnp.ndarray,
    *,
    mode: str,
    train: bool = False,
    compute_dtype=None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Per-step 2048-d backbone features.

    ``mode='video'``: batch is (B, T, H, W, 3) NHWC frames in [0, 1]
    (the ``extract_features`` flatten at ``/root/reference/XceptionLSTMV.py:46-63``).
    ``mode='audio'``: batch is (B, T, 3, 13) channel-tripled MFCC steps; each
    step becomes a (13, 1) image upsampled to 64x64
    (``/root/reference/XceptionLSTMA.py:39-53``).
    Returns ((B, T, 2048), new_backbone_state).
    """
    if mode == "video":
        B, T = batch.shape[:2]
        frames = batch.reshape((B * T,) + batch.shape[2:])
    elif mode == "audio":
        B, T, C, n_mfcc = batch.shape
        # (B*T, 3, 13) -> NHWC (B*T, 13, 1, 3) -> bilinear 64x64.
        frames = batch.reshape(B * T, C, n_mfcc).transpose(0, 2, 1)[:, :, None, :]
        frames = resize_bilinear(frames, (64, 64))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    feats, new_bstate = xception_apply(
        params["backbone"], state["backbone"], frames, train=train, compute_dtype=compute_dtype,
        remat=remat,
    )
    return feats.reshape(B, T, FEATURE_DIM), {"backbone": new_bstate}


def xception_lstm_embed(
    params,
    features: jnp.ndarray,
    *,
    lengths: Optional[jnp.ndarray] = None,
    mask_padding: bool = True,
    compute_dtype=None,
) -> jnp.ndarray:
    """LSTM over features, final-step hidden state (B, hidden).

    This is the embedding the ArcFace training path taps
    (``model.lstm(features)[0][:, -1, :]``, ``/root/reference/train_visual.py:568-569``).
    ``mask_padding=False`` + lengths reproduces the reference's pad-consuming
    ``[:, -1]`` at the batch max length (see ``ops/lstm.select_last_step``).
    """
    outputs, _ = lstm_apply(params["lstm"], features, compute_dtype=compute_dtype)
    return select_last_step(outputs, lengths, mask_padding=mask_padding)


def xception_lstm_head_apply(
    params,
    features: jnp.ndarray,
    *,
    train: bool = False,
    rng=None,
    lengths: Optional[jnp.ndarray] = None,
    mask_padding: bool = True,
    compute_dtype=None,
    return_logits: bool = False,
) -> jnp.ndarray:
    """LSTM -> MLP -> scalar score per sequence.

    Default output is sigmoid probability (B, 1) like the reference forward;
    ``return_logits`` exposes pre-sigmoid logits for with-logits losses.
    """
    h = xception_lstm_embed(
        params, features, lengths=lengths, mask_padding=mask_padding, compute_dtype=compute_dtype
    )
    keys = jax.random.split(rng, 4) if (train and rng is not None) else [None] * 4
    for layer, k in zip(params["fc_layers"], keys):
        h = jax.nn.relu(linear(layer, h, compute_dtype=compute_dtype))
        if train and k is not None:
            keep = jax.random.bernoulli(k, 0.7, h.shape)
            h = jnp.where(keep, h / 0.7, 0.0).astype(h.dtype)
    logits = linear(params["fc_out"], h, compute_dtype=compute_dtype)
    if return_logits:
        return logits
    return jax.nn.sigmoid(logits.astype(jnp.float32))


# ---------------------------------------------------------------------------
# ArcFace
# ---------------------------------------------------------------------------

def arcface_init(rng, feat_dim: int, num_classes: int = 2, *, dtype=jnp.float32):
    """Xavier-uniform (num_classes, feat_dim) weight, stored as given."""
    limit = jnp.sqrt(6.0 / (num_classes + feat_dim))
    return {"w": jax.random.uniform(rng, (num_classes, feat_dim), dtype, -limit, limit)}


def arcface_apply(
    params,
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    *,
    s: float = 30.0,
    m: float = 0.5,
) -> jnp.ndarray:
    """Additive angular margin logits.

    Without labels: ``s * cos(theta)``. With labels: the target class logit is
    replaced by ``cos(theta + m)`` (``/root/reference/train_visual.py:464-474``).
    Computed in fp32 — acos near +/-1 is precision-sensitive.
    """
    x = at_least_f32(features)
    w = at_least_f32(params["w"])
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
    cos = x @ w.T
    if labels is None:
        return s * cos
    theta = jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7))
    target = jnp.cos(theta + m)
    one_hot = jax.nn.one_hot(labels, params["w"].shape[0], dtype=cos.dtype)
    return s * (cos * (1 - one_hot) + target * one_hot)


# ---------------------------------------------------------------------------
# Embed head (pooled cross-modal tokens -> 128-d ArcFace embedding)
# ---------------------------------------------------------------------------

def embed_head_init(rng, in_dim: int, *, hidden: int = 256, out: int = 128, dtype=jnp.float32):
    r1, r2 = jax.random.split(rng)
    return {
        "fc1": linear_init(r1, in_dim, hidden, dtype=dtype),
        "fc2": linear_init(r2, hidden, out, dtype=dtype),
    }


def embed_head_apply(params, x: jnp.ndarray, *, train: bool = False, rng=None, compute_dtype=None):
    h = jax.nn.relu(linear(params["fc1"], x, compute_dtype=compute_dtype))
    if train and rng is not None:
        keep = jax.random.bernoulli(rng, 0.8, h.shape)
        h = jnp.where(keep, h / 0.8, 0.0).astype(h.dtype)
    return linear(params["fc2"], h, compute_dtype=compute_dtype)
