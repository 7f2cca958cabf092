"""w8a8 quantized serving path: primitive exactness + bounded logit drift.

The reference has no quantization (pure fp torch); this is a
beyond-parity serving capability, so the contract here is (a) the int8
conv primitive computes exactly the dequantized integer math, (b) the
shared structural walker's fp mode is bit-identical to the shipped folded
forward (so calibration can never drift from serving), and (c) end-to-end
quantized features stay close to the fp32 folded features.
"""
import numpy as np

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.fold import fold_xception_bn, folded_xception_apply
from multimodal_deepfake_detection_tpu.models.quant import (
    calibrate_amax,
    quantize_folded_xception,
    quantize_xception,
    quantized_xception_apply,
    xception_quant_walk,
)
from multimodal_deepfake_detection_tpu.models.xception import xception_init
from multimodal_deepfake_detection_tpu.ops.quant import (
    absmax_scale,
    conv2d_w8a8,
    quantize,
    quantize_weight,
)


def _folded(seed=0, num_classes=2):
    rng = jax.random.PRNGKey(seed)
    params, state = xception_init(rng, num_classes=num_classes)
    ks = jax.random.split(rng, 2)
    state = jax.tree_util.tree_map(
        lambda x: jnp.abs(x + 0.3 * jax.random.normal(ks[0], x.shape)) + 0.05 if x.ndim else x,
        state,
    )
    return fold_xception_bn(params, state)


def test_quantize_roundtrip_exact_ints():
    # values that are exact multiples of the scale reconstruct exactly
    s = 0.5
    x = jnp.asarray([-63.5, -1.0, 0.0, 2.5, 63.5])
    q = quantize(x, s)
    np.testing.assert_array_equal(np.asarray(q), [-127, -2, 0, 5, 127])


def test_weight_quant_per_channel():
    rng = jax.random.PRNGKey(3)
    w = jax.random.normal(rng, (3, 3, 8, 16)) * jnp.arange(1, 17)  # per-O magnitudes
    w_q, s_w = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and s_w.shape == (16,)
    recon = w_q.astype(jnp.float32) * s_w
    # per-channel error bounded by half an LSB of that channel's scale
    err = jnp.max(jnp.abs(recon - w), axis=(0, 1, 2))
    assert np.all(np.asarray(err) <= 0.5 * np.asarray(s_w) + 1e-6)


def test_conv2d_w8a8_matches_integer_math():
    rng = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, 9, 9, 8))
    w = jax.random.normal(k2, (3, 3, 8, 16)) * 0.2
    b = jax.random.normal(k3, (16,))
    w_q, s_w = quantize_weight(w)
    s_in = absmax_scale(x)
    qp = {"w_q": w_q, "s_w": s_w, "s_in": s_in, "b": b}
    out = conv2d_w8a8(qp, x, stride=1, padding=1, out_dtype=jnp.float32)

    # independent integer reference in numpy (int64 accumulate)
    xq = np.asarray(quantize(x, s_in), np.int64)
    wq = np.asarray(w_q, np.int64)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((2, 9, 9, 16), np.int64)
    for ky in range(3):
        for kx in range(3):
            ref += np.einsum("bhwi,io->bhwo", xp[:, ky : ky + 9, kx : kx + 9, :], wq[ky, kx])
    ref_f = ref.astype(np.float64) * (float(s_in) * np.asarray(s_w, np.float64)) + np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref_f, rtol=1e-5, atol=1e-5)


def test_walker_fp_mode_matches_folded_forward():
    folded = _folded(0)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    ref = folded_xception_apply(folded, x, compute_dtype=jnp.bfloat16)
    out = xception_quant_walk(folded, x, quant=False, compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_calibration_covers_all_sites_and_build_validates():
    folded = _folded(1)
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 64, 3))
    amaxes = calibrate_amax(folded, x)
    # stem + 12 blocks' sepconv units (dw+pw amaxes each) + 4 skips +
    # 2 exit sepconvs (dw+pw each)
    n_units = sum(len(bp["units"]) for bp in folded["blocks"])
    n_skip = sum(1 for bp in folded["blocks"] if "skip" in bp)
    assert len(amaxes) == 2 + 2 * n_units + n_skip + 2 * 2
    # per-input-channel amax vectors (the act_scales="channel" fold builds
    # from them; per-tensor reduces with max). A random net can have
    # dead-ReLU channels (amax 0 — the scale floor in _quant_conv_node
    # guards those); the live stem must be nonzero
    assert all(v.ndim == 1 and (v >= 0).all() for v in amaxes.values())
    assert amaxes["conv1"].shape == (3,) and (amaxes["conv1"] > 0).all()
    assert (amaxes["conv2"] > 0).any()
    missing = dict(amaxes)
    missing.pop("blocks/3/units/0/pointwise")
    try:
        quantize_folded_xception(folded, missing)
        raise AssertionError("expected ValueError for missing site")
    except ValueError as e:
        assert "blocks/3/units/0/pointwise" in str(e)


def test_quantized_features_close_to_fp():
    rng = jax.random.PRNGKey(7)
    params, state = xception_init(rng, num_classes=None)
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 64, 64, 3))
    qtree = quantize_xception(params, state, x)
    fp = np.asarray(
        folded_xception_apply(fold_xception_bn(params, state), x, compute_dtype=jnp.bfloat16),
        np.float32,
    )
    q = np.asarray(quantized_xception_apply(qtree, x), np.float32)
    assert q.shape == fp.shape == (2, 2048)
    # cosine similarity of the pooled features: int8 noise must not wash
    # out the representation
    cos = (q * fp).sum() / (np.linalg.norm(q) * np.linalg.norm(fp) + 1e-9)
    assert cos > 0.99, cos
    rel = np.abs(q - fp).mean() / (np.abs(fp).mean() + 1e-9)
    assert rel < 0.2, rel


def test_visual_scorer_w8a8_close_to_fp():
    """Serving opt-in: quantized VisualScorer tracks the fp scorer's probs."""
    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import VisualScorer

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(0), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(1), 8, 2)
    frames = np.random.default_rng(0).integers(0, 255, (2, 3, 64, 64, 3), np.uint8)
    lengths = np.array([3, 2], np.int32)

    fp = VisualScorer(params, bn_state, compute_dtype=jnp.float32, use_pallas=False)
    q = VisualScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False, quantize="w8a8"
    )
    q.calibrate(frames)
    assert q._qbackbone is not None and "w_q" in q._qbackbone["conv1"]
    got_fp = fp.score(frames, lengths)
    got_q = q.score(frames, lengths)
    # probabilities agree within int8 calibration tolerance
    np.testing.assert_allclose(got_q, got_fp, atol=0.1)

    # implicit first-batch calibration path
    q2 = VisualScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False, quantize="w8a8"
    )
    got_q2 = q2.score(frames, lengths)
    np.testing.assert_allclose(got_q2, got_q, atol=1e-6)


def test_audio_scorer_w8a8_close_to_fp():
    from multimodal_deepfake_detection_tpu.models.heads import xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import AudioScorer

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(2), 8)
    waves = np.asarray(
        np.sin(np.linspace(0, 700, 3200)).reshape(2, 1600), np.float32
    ) + 0.1 * np.random.default_rng(0).standard_normal((2, 1600)).astype(np.float32)

    fp = AudioScorer(params, bn_state, compute_dtype=jnp.float32, use_pallas=False)
    q = AudioScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False, quantize="w8a8"
    )
    got_q = q.score(waves)  # implicit calibration
    assert q._qbackbone is not None
    np.testing.assert_allclose(got_q, fp.score(waves), atol=0.1)


def test_au_patch_scorer_w8a8_close_to_fp():
    from multimodal_deepfake_detection_tpu.models.resnet_lstm import au_patch_classifier_init
    from multimodal_deepfake_detection_tpu.models.serve import AUPatchScorer

    params, bn_state = au_patch_classifier_init(jax.random.PRNGKey(3), hidden_dim=8, lstm_hidden=8)
    patches = np.random.default_rng(1).integers(0, 255, (1, 2, 2, 32, 32, 3), np.uint8)

    fp = AUPatchScorer(params, bn_state, compute_dtype=jnp.float32)
    q = AUPatchScorer(params, bn_state, compute_dtype=jnp.float32, quantize="w8a8")
    got_q = q.score(patches)
    assert q._qbackbone is not None
    np.testing.assert_allclose(got_q, fp.score(patches), atol=0.1)


def test_au_face_scorer_w8a8_close_to_fp():
    from multimodal_deepfake_detection_tpu.models.au_face import au_face_detector_init
    from multimodal_deepfake_detection_tpu.models.serve import AUFaceScorer

    params, bn_state = au_face_detector_init(
        jax.random.PRNGKey(4), num_aus=2, face_dim=8, au_dim=8, lstm_hidden=4
    )
    vids = np.random.default_rng(2).integers(0, 255, (1, 2, 32, 32, 3), np.uint8)
    aus = np.random.default_rng(3).integers(0, 255, (1, 2, 2, 32, 32, 3), np.uint8)

    fp = AUFaceScorer(params, bn_state, compute_dtype=jnp.float32)
    q = AUFaceScorer(params, bn_state, compute_dtype=jnp.float32, quantize="w8a8")
    got_q = q.score(vids, aus)
    assert q._qbackbones is not None and set(q._qbackbones) == {"face", "au"}
    np.testing.assert_allclose(got_q, fp.score(vids, aus), atol=0.1)


def test_resnet18_quant_walker_and_features():
    from multimodal_deepfake_detection_tpu.models.fold import (
        fold_resnet18_bn,
        folded_resnet18_apply,
    )
    from multimodal_deepfake_detection_tpu.models.quant import (
        quantize_resnet18,
        resnet18_quant_walk,
    )
    from multimodal_deepfake_detection_tpu.models.resnet import resnet18_init

    params, state = resnet18_init(jax.random.PRNGKey(11))
    x = jax.random.uniform(jax.random.PRNGKey(12), (2, 64, 64, 3))
    folded = fold_resnet18_bn(params, state)
    # fp walker mode is bit-identical to the folded forward
    ref = folded_resnet18_apply(folded, x, compute_dtype=jnp.bfloat16)
    out = resnet18_quant_walk(folded, x, quant=False, compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # w8a8 features stay close
    qtree = quantize_resnet18(params, state, x)
    assert qtree["stages"][1][0]["conv1"]["w_q"].dtype == jnp.int8
    q = np.asarray(resnet18_quant_walk(qtree, x, quant=True), np.float32)
    fp = np.asarray(ref, np.float32)
    cos = (q * fp).sum() / (np.linalg.norm(q) * np.linalg.norm(fp) + 1e-9)
    assert cos > 0.99, cos


def test_quantized_depthwise_features_close_to_fp():
    rng = jax.random.PRNGKey(9)
    params, state = xception_init(rng, num_classes=None)
    x = jax.random.uniform(jax.random.PRNGKey(10), (2, 64, 64, 3))
    qtree = quantize_xception(params, state, x, quant_depthwise=True)
    # every sepconv unit must carry a quantized depthwise node
    assert "w_q" in qtree["blocks"][4]["units"][0]["depthwise"]
    assert qtree["blocks"][4]["units"][0]["depthwise"]["w_q"].dtype == jnp.int8
    fp = np.asarray(
        folded_xception_apply(fold_xception_bn(params, state), x, compute_dtype=jnp.bfloat16),
        np.float32,
    )
    q = np.asarray(quantized_xception_apply(qtree, x), np.float32)
    cos = (q * fp).sum() / (np.linalg.norm(q) * np.linalg.norm(fp) + 1e-9)
    assert cos > 0.985, cos


def test_hybrid_walker_matches_fp_middle_path():
    """w8a8-hybrid trees (skip_middle): middle blocks stay fp nodes, and the
    walker's middle_pallas routing (pos kernel, interpret on CPU) agrees with
    the same tree's plain-XLA middle path within Pallas bf16 round-trip
    tolerance."""
    rng = jax.random.PRNGKey(13)
    params, state = xception_init(rng, num_classes=None)
    folded = fold_xception_bn(params, state)
    x = jax.random.uniform(jax.random.PRNGKey(14), (2, 64, 64, 3))
    amaxes = calibrate_amax(folded, x)
    qtree = quantize_folded_xception(
        folded, amaxes, quant_depthwise=True, skip_middle=True
    )
    # middle blocks (stride-1, start-with-relu) must be fp nodes; entry quantized
    assert "w" in qtree["blocks"][4]["units"][0]["pointwise"]
    assert "w_q" in qtree["blocks"][0]["units"][0]["pointwise"]

    ref = np.asarray(
        xception_quant_walk(qtree, x, quant=True, features_only=True), np.float32
    )
    got = np.asarray(
        xception_quant_walk(
            qtree, x, quant=True, features_only=True,
            middle_pallas=True, pallas_interpret=True,
        ),
        np.float32,
    )
    assert got.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)
    # and the hybrid features still track the fp folded forward
    fp = np.asarray(
        folded_xception_apply(folded, x, compute_dtype=jnp.bfloat16), np.float32
    )
    cos = (got * fp).sum() / (np.linalg.norm(got) * np.linalg.norm(fp) + 1e-9)
    assert cos > 0.985, cos


def test_visual_scorer_w8a8_hybrid_close_to_fp():
    """Serving: quantize='w8a8-hybrid' (int8 entry/exit + Pallas pos middle,
    interpreted on CPU) tracks the fp scorer's probabilities."""
    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import VisualScorer

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(15), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(16), 8, 2)
    frames = np.random.default_rng(4).integers(0, 255, (2, 2, 64, 64, 3), np.uint8)

    fp = VisualScorer(params, bn_state, compute_dtype=jnp.float32, use_pallas=False)
    q = VisualScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False,
        quantize="w8a8-hybrid",
    )
    got_q = q.score(frames)  # implicit calibration
    assert q._qbackbone is not None
    # the hybrid tree keeps middle blocks fp
    assert "w" in q._qbackbone["blocks"][4]["units"][0]["pointwise"]
    np.testing.assert_allclose(got_q, fp.score(frames), atol=0.1)


def test_w8a8_pallas_walker_close_to_xla_int8():
    """Full int8dw trees route middle blocks through the int8-pointwise pos
    kernel under middle_pallas; outputs track the XLA int8 walker (which
    additionally quantizes the depthwise input, so parity is tolerance-level,
    not bit-exact) and the fp folded forward."""
    rng = jax.random.PRNGKey(17)
    params, state = xception_init(rng, num_classes=None)
    folded = fold_xception_bn(params, state)
    x = jax.random.uniform(jax.random.PRNGKey(18), (2, 64, 64, 3))
    amaxes = calibrate_amax(folded, x)
    qtree = quantize_folded_xception(folded, amaxes, quant_depthwise=True)

    ref = np.asarray(
        xception_quant_walk(qtree, x, quant=True, features_only=True), np.float32
    )
    got = np.asarray(
        xception_quant_walk(
            qtree, x, quant=True, features_only=True,
            middle_pallas=True, pallas_interpret=True,
        ),
        np.float32,
    )
    assert got.shape == ref.shape == (2, 2048)
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9)
    assert cos > 0.995, cos
    fp = np.asarray(
        folded_xception_apply(folded, x, compute_dtype=jnp.bfloat16), np.float32
    )
    cos_fp = (got * fp).sum() / (np.linalg.norm(got) * np.linalg.norm(fp) + 1e-9)
    assert cos_fp > 0.985, cos_fp


def test_visual_scorer_w8a8_pallas_close_to_fp():
    """Serving: quantize='w8a8-pallas' (full int8 + int8-pointwise pos middle
    kernel, interpreted on CPU) tracks the fp scorer's probabilities."""
    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import VisualScorer

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(19), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(20), 8, 2)
    frames = np.random.default_rng(5).integers(0, 255, (2, 2, 64, 64, 3), np.uint8)

    fp = VisualScorer(params, bn_state, compute_dtype=jnp.float32, use_pallas=False)
    q = VisualScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False,
        quantize="w8a8-pallas",
    )
    got_q = q.score(frames)  # implicit calibration
    # the full tree stays quantized through the middle flow
    assert "w_q" in q._qbackbone["blocks"][4]["units"][0]["pointwise"]
    np.testing.assert_allclose(got_q, fp.score(frames), atol=0.1)


def test_audio_scorer_w8a8_pallas_close_to_fp():
    """AudioScorer accepts the hybrid/pallas quant modes too (same Xception
    backbone); w8a8-pallas tracks the fp scorer."""
    from multimodal_deepfake_detection_tpu.models.heads import xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import AudioScorer

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(21), 8)
    waves = np.asarray(
        np.sin(np.linspace(0, 700, 3200)).reshape(2, 1600), np.float32
    ) + 0.1 * np.random.default_rng(6).standard_normal((2, 1600)).astype(np.float32)

    fp = AudioScorer(params, bn_state, compute_dtype=jnp.float32, use_pallas=False)
    q = AudioScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False,
        quantize="w8a8-pallas",
    )
    got_q = q.score(waves)  # implicit calibration
    assert "w_q" in q._qbackbone["blocks"][4]["units"][0]["pointwise"]
    np.testing.assert_allclose(got_q, fp.score(waves), atol=0.1)


def test_sharded_w8a8_scorer_matches_single_chip():
    """Mesh-sharded w8a8 serving == single-chip: the quantized tree (int8
    weights + scales) replicates over the mesh at calibrate() time and the
    batch splits over 'data', scores unchanged."""
    from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
    from multimodal_deepfake_detection_tpu.models.serve import VisualScorer
    from multimodal_deepfake_detection_tpu.parallel.mesh import make_mesh

    params, bn_state = xception_lstm_init(jax.random.PRNGKey(22), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(23), 8, 2)
    frames = np.random.default_rng(7).integers(0, 255, (3, 2, 32, 32, 3), np.uint8)

    single = VisualScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False, quantize="w8a8"
    )
    single.calibrate(frames)
    ref = single.score(frames)

    mesh = make_mesh(devices=jax.devices()[:8])
    sharded = VisualScorer(
        params, bn_state, compute_dtype=jnp.float32, use_pallas=False,
        quantize="w8a8", mesh=mesh,
    )
    sharded.calibrate(frames)
    got = sharded.score(frames)
    assert got.shape == (3,)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_depthwise_w8a8_degenerate_spatial_matches_integer_math():
    """The H*W<=16 shift-add path (ops/quant.py): the XLA-TPU int8 depthwise
    emitter was measured (round 5) returning a BATCH-CONSTANT result on 1x1
    spatial inside large programs — this pins the unrolled integer path to
    exact integer math on the shapes that route through it (1x1 and 2x2, the
    32^2-visual / 64^2-audio micro-fixture exit flows)."""
    from multimodal_deepfake_detection_tpu.ops.quant import depthwise_conv2d_w8a8

    for H in (1, 2, 4):
        rng = jax.random.PRNGKey(40 + H)
        k1, k2 = jax.random.split(rng)
        C = 24
        x = jax.random.normal(k1, (3, H, H, C))
        w = jax.random.normal(k2, (3, 3, 1, C)) * 0.2
        w_q, s_w = quantize_weight(w)
        s_in = absmax_scale(x)
        out = depthwise_conv2d_w8a8(
            {"w_q": w_q, "s_w": s_w, "s_in": s_in}, x, padding=1, out_dtype=jnp.float32
        )
        xq = np.asarray(quantize(x, s_in), np.int64)
        wq = np.asarray(w_q, np.int64)
        xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ref = np.zeros((3, H, H, C), np.int64)
        for ky in range(3):
            for kx in range(3):
                ref += xp[:, ky : ky + H, kx : kx + H, :] * wq[ky, kx, 0][None, None, None, :]
        ref_f = ref.astype(np.float64) * (float(s_in) * np.asarray(s_w, np.float64))
        np.testing.assert_allclose(np.asarray(out, np.float64), ref_f, rtol=1e-5, atol=1e-5)
        # the batch rows must differ (the miscompilation's signature was a
        # constant-over-batch output)
        o = np.asarray(out)
        assert np.abs(o - o.mean(0, keepdims=True)).max() > 1e-3


def test_channel_act_scales_preserve_narrow_channels():
    """act_scales="channel" (SmoothQuant-style folding): batch-varying signal
    living in channels whose range is a sliver of the per-tensor amax
    survives quantization. This is the round-5 trained-visual collapse
    mechanism in miniature: a large constant "carrier" channel sets the
    per-tensor scale and the informative channels round to zero (output goes
    batch-constant, AUC 1.0 -> 0.5); per-channel folding keeps them alive."""
    from multimodal_deepfake_detection_tpu.models.quant import _quant_conv_node

    rng = np.random.default_rng(0)
    B, C = 8, 8
    x = rng.normal(0, 0.01, (B, 1, 1, C)).astype(np.float32)  # the signal
    x[:, :, :, 0] = 10.0  # constant carrier channel -> per-tensor amax 10
    w = rng.normal(0, 0.3, (1, 1, C, 5)).astype(np.float32)
    conv = {"w": jnp.asarray(w), "b": jnp.zeros((5,), jnp.float32)}
    a_vec = np.abs(x).max(axis=(0, 1, 2))
    ref = (x.reshape(B, C) @ w[0, 0]).astype(np.float64)
    ref_spread = np.abs(ref - ref.mean(0, keepdims=True)).max()

    spread = {}
    for mode in ("tensor", "channel"):
        node = _quant_conv_node(conv, a_vec, headroom=1.0, act_scales=mode, smooth_alpha=0.5)
        if mode == "channel":
            assert node["s_in"].shape == (C,) and node["s_dq"].ndim == 0
        y = np.asarray(
            conv2d_w8a8(node, jnp.asarray(x), stride=1, padding=0, out_dtype=jnp.float32),
            np.float64,
        ).reshape(B, 5)
        spread[mode] = float(np.abs(y - y.mean(0, keepdims=True)).max())
    # per-tensor: every signal channel is below half the 10/127 step -> the
    # output is exactly batch-constant; channel folding keeps >=half of the
    # true batch spread
    assert spread["tensor"] == 0.0, spread
    assert spread["channel"] > 0.5 * ref_spread, (spread, ref_spread)
