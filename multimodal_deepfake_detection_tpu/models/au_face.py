"""Cross-modal face+AU detector ("AUFaceModel" / phantom D4).

Reconstruction of ``Models.AUFaceModel.AUFaceCrossDetector`` — absent from the
reference repo; the contract is pinned by its call sites
(``/root/reference/train_au_face.py:594,654-674``, ``test_au_face.py:169``):

    ctor (num_aus=17, face_dim=512, au_dim=512, lstm_hidden=256)
    forward(videos, au_patches, au_mask=None, au_weight=None)
        -> (logits (B, 1), v_tokens (B, T, face_dim), au_tokens (B, T, au_dim))

with token streams feeding the ArcFace-embed pooling, the MSE alignment and
temporal-smoothness regularizers, and t-SNE exports. Internals are
under-determined, so this is an original TPU-first two-stream design:

* **face stream** — per-frame ResNet-18 -> linear(face_dim) -> biLSTM
  (lstm_hidden=256 per direction, so outputs are exactly face_dim=512);
* **AU stream** — per-patch ResNet-18 -> linear -> per-frame attention pool
  over the AU axis (mask/weight-aware, the D5 blending rule) -> biLSTM;
* **cross-modal exchange** — one round of bidirectional single-head
  scaled-dot-product cross-attention with residual connections (face queries
  AU tokens and vice versa), so each stream's tokens carry the other
  modality's evidence before pooling;
* **head** — mean-pooled concat -> MLP -> scalar logit.

Shapes: videos (B, T, H, W, 3) NHWC (the torch call sites permute to
(B, C, T, H, W); channel-last is the TPU layout), au_patches
(B, T, A, h, w, 3), au_mask/au_weight (B, T, A).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import linear, linear_init
from ..ops.lstm import bilstm_apply, bilstm_init
from .resnet import FEATURE_DIM, resnet18_apply, resnet18_init


def au_face_detector_init(
    rng,
    *,
    num_aus: int = 17,
    face_dim: int = 512,
    au_dim: int = 512,
    lstm_hidden: int = 256,
    dtype=jnp.float32,
):
    assert face_dim == 2 * lstm_hidden and au_dim == 2 * lstm_hidden, (
        "token dims are the biLSTM output width (2*lstm_hidden)"
    )
    ks = jax.random.split(rng, 12)
    face_backbone_p, face_backbone_s = resnet18_init(ks[0], dtype=dtype)
    au_backbone_p, au_backbone_s = resnet18_init(ks[1], dtype=dtype)
    params = {
        "face_backbone": face_backbone_p,
        "au_backbone": au_backbone_p,
        "face_proj": linear_init(ks[2], FEATURE_DIM, 2 * lstm_hidden, dtype=dtype),
        "au_proj": linear_init(ks[3], FEATURE_DIM, 2 * lstm_hidden, dtype=dtype),
        "au_attn": linear_init(ks[4], 2 * lstm_hidden, 1, dtype=dtype),
        "face_lstm": bilstm_init(ks[5], 2 * lstm_hidden, lstm_hidden, dtype=dtype),
        "au_lstm": bilstm_init(ks[6], 2 * lstm_hidden, lstm_hidden, dtype=dtype),
        "cross_q_face": linear_init(ks[7], face_dim, face_dim, dtype=dtype),
        "cross_q_au": linear_init(ks[8], au_dim, au_dim, dtype=dtype),
        "head_fc1": linear_init(ks[9], face_dim + au_dim, 256, dtype=dtype),
        "head_fc2": linear_init(ks[10], 256, 1, dtype=dtype),
    }
    state = {"face_backbone": face_backbone_s, "au_backbone": au_backbone_s}
    return params, state


def _cross_attend(q_proj, queries, keys_values, *, compute_dtype, key_valid=None):
    """Single-head scaled-dot-product cross-attention with residual.

    ``key_valid`` (scalar) masks keys at ``s >= key_valid`` out of the softmax
    — bucket-padded key tokens become exactly inert (models/serve.py)."""
    q = linear(q_proj, queries, compute_dtype=compute_dtype)
    d = q.shape[-1]
    scores = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32), keys_values.astype(jnp.float32))
    scores = scores / jnp.sqrt(float(d))
    if key_valid is not None:
        mask = jnp.arange(scores.shape[-1]) < key_valid
        scores = jnp.where(mask[None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bts,bsd->btd", attn, keys_values.astype(jnp.float32))
    return queries + ctx.astype(queries.dtype)


def _masked_mean(tokens: jnp.ndarray, valid) -> jnp.ndarray:
    """Mean over the time axis; with ``valid`` (scalar), only steps < valid."""
    x = tokens.astype(jnp.float32)
    if valid is None:
        return jnp.mean(x, axis=1)
    mask = (jnp.arange(x.shape[1]) < valid).astype(jnp.float32)[None, :, None]
    return jnp.sum(x * mask, axis=1) / jnp.maximum(valid, 1).astype(jnp.float32)


def au_face_detector_apply(
    params,
    state,
    videos: jnp.ndarray,
    au_patches: jnp.ndarray,
    au_mask: Optional[jnp.ndarray] = None,
    au_weight: Optional[jnp.ndarray] = None,
    *,
    v_valid=None,
    au_valid=None,
    train: bool = False,
    compute_dtype=None,
    face_backbone_fn=None,
    au_backbone_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Returns (logits (B, 1), v_tokens (B, T, 512), au_tokens (B, Ta, 512), new_state).

    ``v_valid`` / ``au_valid`` (scalars, static or traced) mark the valid
    prefix of the (possibly bucket-padded) time axes: the biLSTM backward
    scans start at the valid end, padded tokens are masked out of the
    cross-attention keys and the mean pools — so logits are invariant to the
    bucket width (the serving engines' bounded-compile dispatch,
    models/serve.py). ``None`` keeps the plain full-axis behavior (the
    reference's pad-consuming collate semantics)."""
    B, T = videos.shape[:2]
    Ta, A = au_patches.shape[1], au_patches.shape[2]
    new_state = {}

    # --- face stream: one flattened backbone batch over (B*T) frames ---
    # (``*_backbone_fn`` overrides swap in the w8a8 quantized ResNet-18 for
    # serving, models/quant.py)
    frames = videos.reshape((B * T,) + videos.shape[2:])
    if face_backbone_fn is not None:
        f_feats, new_state["face_backbone"] = face_backbone_fn(frames), state["face_backbone"]
    else:
        f_feats, new_state["face_backbone"] = resnet18_apply(
            params["face_backbone"], state["face_backbone"], frames, train=train, compute_dtype=compute_dtype
        )
    f_tokens = linear(params["face_proj"], f_feats, compute_dtype=compute_dtype).reshape(B, T, -1)
    v_tokens = bilstm_apply(params["face_lstm"], f_tokens, compute_dtype=compute_dtype, valid_T=v_valid)

    # --- AU stream: (B*Ta*A) patch batch, attention pool over AUs per frame ---
    patches = au_patches.reshape((B * Ta * A,) + au_patches.shape[3:])
    if au_backbone_fn is not None:
        a_feats, new_state["au_backbone"] = au_backbone_fn(patches), state["au_backbone"]
    else:
        a_feats, new_state["au_backbone"] = resnet18_apply(
            params["au_backbone"], state["au_backbone"], patches, train=train, compute_dtype=compute_dtype
        )
    a_feats = linear(params["au_proj"], a_feats, compute_dtype=compute_dtype).reshape(B, Ta, A, -1)
    scores = linear(params["au_attn"], a_feats, compute_dtype=compute_dtype).astype(jnp.float32)
    if au_mask is not None:
        scores = jnp.where(au_mask[..., None] > 0, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=2)
    if au_weight is not None:
        combined = attn * au_weight[..., None].astype(jnp.float32)
        attn = combined / (jnp.sum(combined, axis=2, keepdims=True) + 1e-6)
    a_pooled = jnp.sum(attn.astype(a_feats.dtype) * a_feats, axis=2)  # (B, Ta, D)
    au_tokens = bilstm_apply(params["au_lstm"], a_pooled, compute_dtype=compute_dtype, valid_T=au_valid)

    # --- cross-modal exchange (padded tokens masked out of the keys) ---
    v_tokens = _cross_attend(
        params["cross_q_face"], v_tokens, au_tokens, compute_dtype=compute_dtype, key_valid=au_valid
    )
    au_tokens = _cross_attend(
        params["cross_q_au"], au_tokens, v_tokens, compute_dtype=compute_dtype, key_valid=v_valid
    )

    # --- classification head on pooled concat ---
    pooled = jnp.concatenate(
        [_masked_mean(v_tokens, v_valid), _masked_mean(au_tokens, au_valid)],
        axis=-1,
    ).astype(v_tokens.dtype)
    h = jax.nn.relu(linear(params["head_fc1"], pooled, compute_dtype=compute_dtype))
    logits = linear(params["head_fc2"], h, compute_dtype=compute_dtype)
    return logits, v_tokens, au_tokens, new_state
