"""Closed-form affine refinement of the w8a8 PTQ path.

The reference has no quantization (pure fp torch, /root/reference/Xception.py);
refinement is a beyond-parity capability on top of the PTQ path, so its
contract is: (1) the walker's ``tap`` hook exposes every conv output in walk
order, (2) the per-channel affine correction folds exactly into the dequant
epilogue (same serving cost), (3) refinement measurably reduces the quantized
tree's end-to-end feature error on held-out data.

Gradient-based QAT (STE self-distillation) was tried first and rejected by
measurement — from an exact-match init the objective sits at the rounding
noise floor and the STE direction is not a descent direction (see
models/quant.py::refine_quantized_xception and PERF.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn
from multimodal_deepfake_detection_tpu.models.quant import (
    _sites,
    calibrate_amax,
    quantize_folded_xception,
    refine_quantized_xception,
    xception_quant_walk,
)
from multimodal_deepfake_detection_tpu.models.xception import xception_init


def _folded_net(seed=0):
    params, state = xception_init(jax.random.PRNGKey(seed), num_classes=None)
    return fold_xception_bn(params, state)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def test_tap_hook_covers_every_conv_site():
    folded = _folded_net()
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    taps = {}
    xception_quant_walk(
        folded, x, quant=False, compute_dtype=jnp.float32, features_only=True,
        tap=lambda s, v: taps.__setitem__(s, v),
    )
    assert set(taps) == set(_sites(folded, depthwise=True))
    # tapped values are pre-activation conv outputs: conv1's tap must go
    # negative somewhere (relu is applied by the caller, after the tap)
    assert float(jnp.min(taps["conv1"])) < 0


def test_shadow_pairs_local_quant_outputs():
    """shadow= applies the quant node to the SAME fp input at each site."""
    from multimodal_deepfake_detection_tpu.ops.quant import conv2d_w8a8

    folded = _folded_net()
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    amaxes = calibrate_amax(folded, x, compute_dtype=jnp.float32)
    q0 = quantize_folded_xception(folded, amaxes, quant_depthwise=True)
    pairs = {}
    xception_quant_walk(
        folded, x, quant=False, compute_dtype=jnp.float32, features_only=True,
        tap=lambda s, yf, yq: pairs.__setitem__(s, (yf, yq)), shadow=q0,
    )
    assert set(pairs) == set(_sites(folded, depthwise=True))
    yf, yq = pairs["conv1"]
    # conv1's input is the raw x for both streams -> shadow output must be
    # exactly the standalone quantized conv on x
    ref = conv2d_w8a8(q0["conv1"], x, stride=2, padding=0, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(yq), np.asarray(ref), rtol=0, atol=1e-6)
    assert not np.allclose(np.asarray(yf), np.asarray(yq))

    with pytest.raises(ValueError, match="shadow"):
        xception_quant_walk(folded, x, quant=False, shadow=q0)


def test_tap_rejects_middle_pallas():
    folded = _folded_net()
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    with pytest.raises(ValueError, match="tap"):
        xception_quant_walk(
            folded, x, quant=False, middle_pallas=True, tap=lambda s, v: None
        )


def test_refine_reduces_exported_int8_error():
    """End-to-end feature error drops on the calibration batch AND on held-out
    inputs (the correction must generalize, not memorize the batch)."""
    folded = _folded_net()
    x = jnp.asarray(np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (4, 64, 64, 3))))
    x_hold = jnp.asarray(np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (4, 64, 64, 3))))

    def feats(tree, inp, quant):
        return xception_quant_walk(
            tree, inp, quant=quant, compute_dtype=jnp.float32, features_only=True
        )

    fp, fp_h = feats(folded, x, False), feats(folded, x_hold, False)
    amaxes = calibrate_amax(folded, x, compute_dtype=jnp.float32)
    q0 = quantize_folded_xception(folded, amaxes, quant_depthwise=True)
    e0, e0_h = _rel_err(feats(q0, x, True), fp), _rel_err(feats(q0, x_hold, True), fp_h)

    qr = refine_quantized_xception(q0, folded, x, passes=1)
    e1, e1_h = _rel_err(feats(qr, x, True), fp), _rel_err(feats(qr, x_hold, True), fp_h)
    # measured on this synthetic net + 4-image calib: calib 0.857x, holdout
    # 0.935x (production-size calib batches shrink the exit fits far less)
    assert e1 < e0 * 0.92, (e0, e1)
    assert e1_h < e0_h * 0.97, (e0_h, e1_h)
    # refinement must not mutate its input tree
    assert _rel_err(feats(q0, x, True), fp) == e0


def test_refined_tree_serves_at_ptq_structure():
    """Refinement only rescales s_w / b — same pytree structure, same dtypes,
    so every serving path (XLA, pos-Pallas packers) consumes it unchanged."""
    folded = _folded_net()
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    amaxes = calibrate_amax(folded, x, compute_dtype=jnp.float32)
    q0 = quantize_folded_xception(folded, amaxes, quant_depthwise=True)
    qr = refine_quantized_xception(q0, folded, x, passes=1)
    s0 = jax.tree_util.tree_structure(q0)
    s1 = jax.tree_util.tree_structure(qr)
    assert s0 == s1
    changed = jax.tree_util.tree_map(
        lambda a, b: a.dtype == b.dtype and a.shape == b.shape, q0, qr
    )
    assert all(jax.tree_util.tree_leaves(changed))
    # and the int8 weights themselves are untouched (only the epilogue moved)
    np.testing.assert_array_equal(
        np.asarray(q0["conv1"]["w_q"]), np.asarray(qr["conv1"]["w_q"])
    )
    assert not np.allclose(np.asarray(q0["conv1"]["s_w"]), np.asarray(qr["conv1"]["s_w"]))


def test_refine_resnet18_reduces_error():
    """The generic refinement core works on the ResNet-18 AU backbone too."""
    from multimodal_deepfake_detection_tpu.models.fold import fold_resnet18_bn
    from multimodal_deepfake_detection_tpu.models.quant import (
        calibrate_resnet18_amax,
        quantize_folded_resnet18,
        refine_quantized_resnet18,
        resnet18_quant_walk,
    )
    from multimodal_deepfake_detection_tpu.models.resnet import resnet18_init

    params, state = resnet18_init(jax.random.PRNGKey(0))
    folded = fold_resnet18_bn(params, state)
    x = jnp.asarray(np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 64, 64, 3))))
    x_h = jnp.asarray(np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (8, 64, 64, 3))))

    def feats(tree, inp, quant):
        return resnet18_quant_walk(tree, inp, quant=quant, compute_dtype=jnp.float32)

    fp, fp_h = feats(folded, x, False), feats(folded, x_h, False)
    amaxes = calibrate_resnet18_amax(folded, x, compute_dtype=jnp.float32)
    q0 = quantize_folded_resnet18(folded, amaxes)
    e0, e0_h = _rel_err(feats(q0, x, True), fp), _rel_err(feats(q0, x_h, True), fp_h)
    qr = refine_quantized_resnet18(q0, folded, x, passes=1)
    e1, e1_h = _rel_err(feats(qr, x, True), fp), _rel_err(feats(qr, x_h, True), fp_h)
    assert e1 < e0 * 0.95, (e0, e1)
    assert e1_h < e0_h, (e0_h, e1_h)


def test_au_patch_scorer_refine_calibrate():
    """calibrate(refine_passes=) plumbs through the AU-patch serving engine."""
    from multimodal_deepfake_detection_tpu.models.resnet_lstm import au_patch_classifier_init
    from multimodal_deepfake_detection_tpu.models.serve import AUPatchScorer

    params, bn_state = au_patch_classifier_init(
        jax.random.PRNGKey(0), hidden_dim=8, lstm_hidden=8
    )
    sc = AUPatchScorer(params, bn_state, compute_dtype=jnp.float32, quantize="w8a8")
    patches = np.random.default_rng(0).integers(0, 255, (2, 2, 3, 32, 32, 3), np.uint8)
    sc.calibrate(patches, refine_passes=1)
    assert sc._qbackbone is not None
    probs = sc.score(patches)
    assert probs.shape == (2,) and np.all((probs >= 0) & (probs <= 1))


def test_visual_scorer_refine_calibrate():
    """calibrate(refine_passes=...) plumbs refinement through the serving engine."""
    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import VisualScorer

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(0), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(1), 8, 2)

    def scorer():
        return VisualScorer(
            params, bn_state, compute_dtype=jnp.float32, use_pallas=False, quantize="w8a8"
        )

    frames = np.random.default_rng(0).integers(0, 255, (2, 2, 64, 64, 3), np.uint8)
    sc0, sc1 = scorer(), scorer()
    sc0.calibrate(frames)
    sc1.calibrate(frames, refine_passes=1)
    assert not np.allclose(
        np.asarray(sc0._qbackbone["conv1"]["s_w"]),
        np.asarray(sc1._qbackbone["conv1"]["s_w"]),
    )
    probs = sc1.score(frames)
    assert probs.shape == (2,) and np.all((probs >= 0) & (probs <= 1))
