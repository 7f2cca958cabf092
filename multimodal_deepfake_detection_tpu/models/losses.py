"""Loss zoo — every objective the reference trains with, as pure functions.

Sources (behavioral, per SURVEY.md §2):
* BCE on sigmoid outputs — ``/root/reference/train_audio.py:20``.
* BCE-with-logits + label smoothing — ``/root/reference/train_au_patch.py:203-211``
  (smoothing 0.1; a dead variant used 0.5, ``train_visual.py:45-53``).
* Focal loss — dead variant ``train_visual.py:55-66``.
* Class-balanced focal (Cui et al. effective-number weights) on ArcFace
  logits — ``/root/reference/train_au_face.py:445-458``.
* Cross-entropy on ArcFace margin logits — ``train_visual.py:532``.
* Cross-modal regularizers: MSE alignment of pooled streams + temporal
  smoothness of token sequences — ``train_au_face.py:669-674``.

All reductions are means (matching torch defaults); everything is fp32
internally so bf16 activations do not erode the loss.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.precision import at_least_f32


def _f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def _wmean(values: jnp.ndarray, sample_weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean, or weighted mean when ``sample_weight`` is given (used to mask
    batch-padding rows under static shapes)."""
    if sample_weight is None:
        return jnp.mean(values)
    w = sample_weight.astype(jnp.float32).reshape(values.shape)
    return jnp.sum(w * values) / jnp.maximum(jnp.sum(w), 1e-12)


@jax.custom_vjp
def _bce_elem(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE-on-probabilities with torch ``nn.BCELoss`` saturation
    semantics: log terms clamped at -100 forward, and the backward formula
    ``(p - t) / max(p*(1-p), 1e-12)`` — finite (if huge) at p in {0, 1}, the
    direction Adam then renormalizes. A plain epsilon clip on ``p`` cannot do
    this in fp32 (1 - 1e-12 rounds to 1.0, reviving log(0) = -inf and a NaN
    grad — observed killing train_audio once a learned fixture saturated the
    sigmoid), and autodiff through a log clamp yields 0 * inf = NaN instead.

    Deliberate deviation: the target-side cotangent reuses the clamped log
    terms, so d/dt is bounded at +-200 where torch's is infinite at saturated
    p. Nothing in the framework differentiates w.r.t. targets (labels are
    data), so the parity scope is p-gradients only — torch-exact there."""
    log_p = jnp.maximum(jnp.log(p), -100.0)
    log_1mp = jnp.maximum(jnp.log(1.0 - p), -100.0)
    return -(t * log_p + (1 - t) * log_1mp)


def _bce_elem_fwd(p, t):
    return _bce_elem(p, t), (p, t)


def _bce_elem_bwd(res, g):
    p, t = res
    dp = (p - t) / jnp.maximum(p * (1.0 - p), 1e-12)  # torch's clamped backward
    dt = jnp.maximum(jnp.log(1.0 - p), -100.0) - jnp.maximum(jnp.log(p), -100.0)
    return g * dp, g * dt


_bce_elem.defvjp(_bce_elem_fwd, _bce_elem_bwd)


def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray, *, sample_weight=None) -> jnp.ndarray:
    """Binary cross-entropy on probabilities (torch ``nn.BCELoss``), finite
    in value and grad at saturated probs exactly like torch (see _bce_elem)."""
    p, t = _f32(probs, targets)
    return _wmean(_bce_elem(p, t), sample_weight)


def bce_with_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray, *, sample_weight=None) -> jnp.ndarray:
    """Numerically-stable BCE on logits (torch ``nn.BCEWithLogitsLoss``)."""
    z, t = _f32(logits, targets)
    return _wmean(jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))), sample_weight)


def label_smoothing_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray, smoothing: float = 0.1, *, sample_weight=None) -> jnp.ndarray:
    """targets -> targets*(1-s) + 0.5*s, then BCE-with-logits."""
    t = targets.astype(jnp.float32) * (1 - smoothing) + 0.5 * smoothing
    return bce_with_logits_loss(logits, t, sample_weight=sample_weight)


def focal_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0, *, sample_weight=None) -> jnp.ndarray:
    """Binary focal loss on logits (dead-variant parity, train_visual.py:55-66)."""
    z, t = _f32(logits, targets)
    ce = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    p = jax.nn.sigmoid(z)
    pt = p * t + (1 - p) * (1 - t)
    a_t = alpha * t + (1 - alpha) * (1 - t)
    return _wmean(a_t * (1 - pt) ** gamma * ce, sample_weight)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    class_weights: Optional[jnp.ndarray] = None,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over integer labels; optional per-class weights (torch semantics:
    weighted sum divided by the sum of the sample weights)."""
    logp = jax.nn.log_softmax(at_least_f32(logits), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    w = jnp.ones_like(nll)
    if class_weights is not None:
        w = w * class_weights.astype(jnp.float32)[labels]
    if sample_weight is not None:
        w = w * sample_weight.astype(jnp.float32).reshape(w.shape)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def cb_focal_class_weights(samples_per_cls: Sequence[int], beta: float = 0.9999) -> jnp.ndarray:
    """Class-balanced 'effective number' weights, normalized to sum to C."""
    counts = jnp.asarray(samples_per_cls, jnp.float32)
    effective_num = 1.0 - jnp.power(beta, counts)
    weights = (1.0 - beta) / effective_num
    return weights / jnp.sum(weights) * counts.shape[0]


def cb_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
    gamma: float = 2.0,
    *,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Class-balanced focal loss on (ArcFace) logits.

    Per-sample: ``(1 - exp(-ce))**gamma * ce`` where ``ce`` is *weighted*
    cross-entropy — exactly the reference composition
    (``/root/reference/train_au_face.py:452-458``: per-sample weighted CE via
    ``F.cross_entropy(..., weight=...)``, then plain mean of the focal terms).
    """
    logp = jax.nn.log_softmax(at_least_f32(logits), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    ce = class_weights.astype(jnp.float32)[labels] * nll
    pt = jnp.exp(-ce)
    return _wmean((1 - pt) ** gamma * ce, sample_weight)


def clamp_logits(logits: jnp.ndarray, limit: float = 10.0) -> jnp.ndarray:
    """Numerical guard: clamp logits to +/-limit before a BCE-style loss —
    the reference's dead-variant stabilizer (``train_visual.py:333``), exposed
    as a deliberate capability (SURVEY.md §5 NaN/Inf guards)."""
    return jnp.clip(logits, -limit, limit)


def align_mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross-modal pooled-feature alignment (train_au_face.py:670)."""
    a, b = _f32(a, b)
    return jnp.mean((a - b) ** 2)


def temporal_smoothness_loss(tokens: jnp.ndarray) -> jnp.ndarray:
    """Mean squared first difference along the token/time axis (B, T, D)."""
    t = tokens.astype(jnp.float32)
    if t.shape[1] <= 1:
        return jnp.zeros((), jnp.float32)
    return jnp.mean((t[:, 1:] - t[:, :-1]) ** 2)


def adaptive_loss_init() -> dict:
    """Learnable loss-mixing scalars for AdaptiveDeepfakeLoss.

    The reference's dead-variant module holds two ``nn.Parameter`` scalars
    ``alpha=0.5`` / ``beta=0.3`` (``/root/reference/train_au_face.py:204-211``,
    ``train_visual.py`` variant with pos_weight at ``:22-35``). Here they live
    as a tiny pytree alongside the model params so the optimizer updates them
    like any other leaf.
    """
    return {"alpha": jnp.asarray(0.5, jnp.float32), "beta": jnp.asarray(0.3, jnp.float32)}


def adaptive_deepfake_loss(
    mix_params: dict,
    loss_cls: jnp.ndarray,
    loss_align: jnp.ndarray,
    loss_temp: jnp.ndarray,
) -> jnp.ndarray:
    """Adaptively-mixed total objective.

    ``total = cls + sigmoid(alpha) * align + sigmoid(beta) * temp``
    (``/root/reference/train_au_face.py:212-227``). Component losses come in
    from the caller so the same mixer serves both reference variants (uniform
    BCE and pos-weighted BCE) as well as this framework's CB-focal objective.
    """
    total = (
        loss_cls
        + jax.nn.sigmoid(mix_params["alpha"]) * loss_align
        + jax.nn.sigmoid(mix_params["beta"]) * loss_temp
    )
    return total
