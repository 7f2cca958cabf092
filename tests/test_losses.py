"""Loss zoo: direct numerical parity vs the torch formulas the reference uses."""
import numpy as np
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models import losses as L

RNG = np.random.default_rng(0)


def _pair(n=16):
    logits = RNG.normal(0, 2, n).astype(np.float32)
    targets = RNG.integers(0, 2, n).astype(np.float32)
    return logits, targets


def test_bce_matches_torch():
    z, t = _pair()
    p = 1 / (1 + np.exp(-z))
    ref = torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t)).item()
    got = float(L.bce_loss(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - ref) < 1e-6


def test_bce_saturated_probs_finite_loss_and_grad():
    """torch BCELoss clamps log terms at -100: probs of exactly 0.0/1.0 give
    finite loss and finite grad. An fp32 epsilon clip cannot reproduce this
    (1-1e-12 rounds to 1.0) — regression for the NaN that killed train_audio
    once the sigmoid saturated on a learned fixture."""
    import jax

    p = np.array([0.0, 1.0, 1.0, 0.5], np.float32)
    t = np.array([1.0, 0.0, 1.0, 1.0], np.float32)
    ref = torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t)).item()
    got, grad = jax.value_and_grad(lambda q: L.bce_loss(q, jnp.asarray(t)))(jnp.asarray(p))
    assert np.isfinite(float(got)) and abs(float(got) - ref) < 1e-4
    assert np.all(np.isfinite(np.asarray(grad)))
    # exact parity with torch's clamped backward (p-t)/max(p(1-p),1e-12)/N
    tp = torch.tensor(p, requires_grad=True)
    torch.nn.BCELoss()(tp, torch.tensor(t)).backward()
    np.testing.assert_allclose(np.asarray(grad), tp.grad.numpy(), rtol=1e-6)


def test_bce_with_logits_matches_torch():
    z, t = _pair()
    ref = torch.nn.BCEWithLogitsLoss()(torch.tensor(z), torch.tensor(t)).item()
    got = float(L.bce_with_logits_loss(jnp.asarray(z), jnp.asarray(t)))
    assert abs(got - ref) < 1e-6


def test_label_smoothing_bce_matches_reference_formula():
    """targets*(1-s)+0.5*s then BCEWithLogits (train_au_patch.py:203-211)."""
    z, t = _pair()
    for s in (0.1, 0.5):
        ts = t * (1 - s) + 0.5 * s
        ref = torch.nn.BCEWithLogitsLoss()(torch.tensor(z), torch.tensor(ts)).item()
        got = float(L.label_smoothing_bce_loss(jnp.asarray(z), jnp.asarray(t), s))
        assert abs(got - ref) < 1e-6


def test_cross_entropy_with_class_weights_matches_torch():
    logits = RNG.normal(0, 2, (10, 2)).astype(np.float32)
    labels = RNG.integers(0, 2, 10)
    w = np.array([0.3, 1.7], np.float32)
    ref = TF.cross_entropy(torch.tensor(logits), torch.tensor(labels), weight=torch.tensor(w)).item()
    got = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), class_weights=jnp.asarray(w)))
    assert abs(got - ref) < 1e-6


def test_cb_focal_matches_reference_composition():
    """(1-exp(-ce))^gamma * ce with weighted per-sample CE, plain mean
    (train_au_face.py:445-458)."""
    logits = RNG.normal(0, 2, (12, 2)).astype(np.float32)
    labels = RNG.integers(0, 2, 12)
    counts = [30, 70]
    beta, gamma = 0.9999, 2.0

    eff = 1.0 - np.power(beta, counts)
    w = (1.0 - beta) / eff
    w = w / w.sum() * 2
    ce = TF.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), reduction="none", weight=torch.tensor(w, dtype=torch.float32)
    )
    pt = torch.exp(-ce)
    ref = (((1 - pt) ** gamma) * ce).mean().item()

    cw = L.cb_focal_class_weights(counts, beta=beta)
    np.testing.assert_allclose(np.asarray(cw), w, rtol=1e-5)
    got = float(L.cb_focal_loss(jnp.asarray(logits), jnp.asarray(labels), cw, gamma))
    assert abs(got - ref) < 1e-5


def test_regularizers():
    a = jnp.asarray(RNG.normal(0, 1, (4, 8)).astype(np.float32))
    b = jnp.asarray(RNG.normal(0, 1, (4, 8)).astype(np.float32))
    assert abs(float(L.align_mse_loss(a, b)) - float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))) < 1e-6
    t = jnp.asarray(RNG.normal(0, 1, (2, 5, 3)).astype(np.float32))
    ref = float(np.mean(np.diff(np.asarray(t), axis=1) ** 2))
    assert abs(float(L.temporal_smoothness_loss(t)) - ref) < 1e-6
    assert float(L.temporal_smoothness_loss(t[:, :1])) == 0.0


def test_clamp_logits():
    z = jnp.asarray([-50.0, -5.0, 0.0, 5.0, 50.0])
    np.testing.assert_array_equal(np.asarray(L.clamp_logits(z)), [-10, -5, 0, 5, 10])


def test_sample_weight_masks_padded_rows():
    z, t = _pair(8)
    w = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)
    ref = float(L.bce_with_logits_loss(jnp.asarray(z[:6]), jnp.asarray(t[:6])))
    got = float(L.bce_with_logits_loss(jnp.asarray(z), jnp.asarray(t), sample_weight=jnp.asarray(w)))
    assert abs(got - ref) < 1e-6


def test_adaptive_deepfake_loss_matches_torch_and_learns():
    """sigmoid(alpha)/sigmoid(beta) mixing == the reference dead-variant module
    (/root/reference/train_au_face.py:204-227), and the scalars get gradients."""
    import jax
    import torch

    mix = L.adaptive_loss_init()
    assert abs(float(mix["alpha"]) - 0.5) < 1e-6 and abs(float(mix["beta"]) - 0.3) < 1e-6

    logits = RNG.normal(0, 1, (6,)).astype(np.float32)
    labels = (np.arange(6) % 2).astype(np.float32)
    v = RNG.normal(0, 1, (2, 5, 4)).astype(np.float32)
    au = RNG.normal(0, 1, (2, 5, 4)).astype(np.float32)

    # torch reference composition
    t_cls = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels))
    t_align = torch.mean((torch.tensor(v) - torch.tensor(au)) ** 2)
    t_delta = torch.tensor(v)[:, 1:] - torch.tensor(v)[:, :-1]
    t_temp = torch.mean(t_delta ** 2)
    ref = float(t_cls + torch.sigmoid(torch.tensor(0.5)) * t_align
                + torch.sigmoid(torch.tensor(0.3)) * t_temp)

    loss_cls = L.bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(labels))
    loss_align = L.align_mse_loss(jnp.asarray(v), jnp.asarray(au))
    loss_temp = L.temporal_smoothness_loss(jnp.asarray(v))
    got = float(L.adaptive_deepfake_loss(mix, loss_cls, loss_align, loss_temp))
    assert abs(got - ref) < 1e-5

    grads = jax.grad(
        lambda m: L.adaptive_deepfake_loss(m, loss_cls, loss_align, loss_temp))(mix)
    # d total / d alpha = sigmoid'(alpha) * loss_align > 0 for nonzero align
    assert float(grads["alpha"]) > 0 and float(grads["beta"]) > 0
