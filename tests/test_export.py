"""AOT serving export (models/export.py): serialized scoring programs
replay bit-identically to the live engines, with a symbolic batch dim.

Beyond-parity capability (the torch reference re-instantiates nn.Modules
from source per eval run); the contract here is (a) roundtrip equality vs
the live scorer at multiple batch sizes through one exported program,
(b) weights travel inside the artifact (no model code at replay time),
(c) the CLI writes a loadable artifact from a checkpoint bundle.
"""
import numpy as np

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.export import (
    export_au_face,
    export_au_patch,
    export_audio,
    export_visual,
    load_exported,
)
from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
from multimodal_deepfake_detection_tpu.models.serve import (
    AudioScorer,
    AUFaceScorer,
    AUPatchScorer,
    VisualScorer,
)


def _visual_scorer(**kw):
    params, bn = xception_lstm_init(jax.random.PRNGKey(0), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(1), 8, 2)
    return VisualScorer(params, bn, compute_dtype=jnp.float32, use_pallas=False, **kw)


def test_export_visual_symbolic_batch_roundtrip():
    sc = _visual_scorer()
    blob = export_visual(sc, T=3, H=64, W=64)
    assert isinstance(blob, bytes) and len(blob) > 1_000_000  # weights inside
    prog = load_exported(blob)
    for B in (2, 5):  # one program, multiple batch sizes
        frames = np.random.default_rng(B).integers(0, 255, (B, 3, 64, 64, 3), np.uint8)
        lengths = np.asarray([3] + [2] * (B - 1), np.int32)
        got = np.asarray(prog.call(jnp.asarray(frames), jnp.asarray(lengths)))
        ref = sc.score(frames, lengths)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_visual_quantized_bakes_int8_tree():
    sc = _visual_scorer(quantize="w8a8")
    frames = np.random.default_rng(7).integers(0, 255, (2, 2, 64, 64, 3), np.uint8)
    sc.calibrate(frames)
    blob = export_visual(sc, T=2, H=64, W=64, batch=2)
    got = np.asarray(load_exported(blob).call(
        jnp.asarray(frames), jnp.asarray(np.full((2,), 2, np.int32))
    ))
    ref = sc.score(frames)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_audio_roundtrip():
    params, bn = xception_lstm_init(jax.random.PRNGKey(2), 8)
    sc = AudioScorer(params, bn, compute_dtype=jnp.float32, use_pallas=False)
    L = 1600
    blob = export_audio(sc, L)
    prog = load_exported(blob)
    hop = sc.mfcc_kw["hop_length"]
    n_frames = 1 + L // hop
    for B in (1, 3):
        waves = np.sin(np.linspace(0, 50 * B, B * L)).reshape(B, L).astype(np.float32)
        lengths = np.full((B,), n_frames, np.int32)
        got = np.asarray(prog.call(jnp.asarray(waves), jnp.asarray(lengths)))
        ref = sc.score(waves)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_au_patch_roundtrip():
    from multimodal_deepfake_detection_tpu.models.resnet_lstm import au_patch_classifier_init

    params, bn = au_patch_classifier_init(jax.random.PRNGKey(3), hidden_dim=8, lstm_hidden=8)
    sc = AUPatchScorer(params, bn, compute_dtype=jnp.float32)
    blob = export_au_patch(sc, T=2, A=2, patch_hw=(32, 32))
    prog = load_exported(blob)
    for B in (1, 2):
        patches = np.random.default_rng(B).integers(0, 255, (B, 2, 2, 32, 32, 3), np.uint8)
        w = np.ones((B, 2, 2), np.float32)
        lengths = np.full((B,), 2, np.int32)
        got = np.asarray(prog.call(jnp.asarray(patches), jnp.asarray(w), jnp.asarray(lengths)))
        ref = sc.score(patches)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_au_face_roundtrip():
    from multimodal_deepfake_detection_tpu.models.au_face import au_face_detector_init

    params, bn = au_face_detector_init(
        jax.random.PRNGKey(4), num_aus=2, face_dim=8, au_dim=8, lstm_hidden=4
    )
    sc = AUFaceScorer(params, bn, compute_dtype=jnp.float32)
    blob = export_au_face(sc, T=2, Ta=2, A=2, face_hw=(32, 32), patch_hw=(32, 32))
    prog = load_exported(blob)
    B = 2
    vids = np.random.default_rng(5).integers(0, 255, (B, 2, 32, 32, 3), np.uint8)
    aus = np.random.default_rng(6).integers(0, 255, (B, 2, 2, 32, 32, 3), np.uint8)
    mask = np.ones((B, 2, 2), np.float32)
    got = np.asarray(prog.call(
        jnp.asarray(vids), jnp.asarray(aus), jnp.asarray(mask), jnp.asarray(mask)
    ))
    ref = sc.score(vids, aus)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_serving_cli(tmp_path):
    from multimodal_deepfake_detection_tpu.cli import export_serving
    from multimodal_deepfake_detection_tpu.core.checkpoint import save_bundle

    params, bn = xception_lstm_init(jax.random.PRNGKey(8), 8)
    arc = arcface_init(jax.random.PRNGKey(9), 8, 2)
    bundle = str(tmp_path / "visual.npz")
    save_bundle(bundle, {"model": params, "arcface": arc, "state": bn})
    out = str(tmp_path / "visual.jaxprog")
    export_serving.main(
        [
            "--engine", "visual",
            "--ckpt_path", bundle,
            "--out", out,
            "--frames", "2",
            "--size", "32",
            "--hidden_dim", "8",
            "--compute_dtype", "float32",
        ],
        log=lambda s: None,
    )
    prog = load_exported(open(out, "rb").read())
    frames = np.random.default_rng(10).integers(0, 255, (2, 2, 32, 32, 3), np.uint8)
    got = np.asarray(prog.call(jnp.asarray(frames), jnp.asarray(np.full((2,), 2, np.int32))))
    assert got.shape == (2,) and np.all((got >= 0) & (got <= 1))


def test_export_serving_cli_quantized_refined(tmp_path):
    """--quantize + --calib_npy + --refine_passes bakes the refined int8 tree
    into the artifact; replay matches the in-process refined scorer."""
    from multimodal_deepfake_detection_tpu.cli import export_serving
    from multimodal_deepfake_detection_tpu.core.checkpoint import save_bundle

    params, bn = xception_lstm_init(jax.random.PRNGKey(8), 8)
    arc = arcface_init(jax.random.PRNGKey(9), 8, 2)
    bundle = str(tmp_path / "visual.npz")
    save_bundle(bundle, {"model": params, "arcface": arc, "state": bn})
    frames = np.random.default_rng(10).integers(0, 255, (2, 2, 32, 32, 3), np.uint8)
    calib = str(tmp_path / "calib.npy")
    np.save(calib, frames)
    out = str(tmp_path / "visual_q.jaxprog")
    export_serving.main(
        [
            "--engine", "visual", "--ckpt_path", bundle, "--out", out,
            "--frames", "2", "--size", "32", "--hidden_dim", "8",
            "--compute_dtype", "float32", "--batch", "2",
            "--quantize", "w8a8", "--calib_npy", calib, "--refine_passes", "1",
        ],
        log=lambda s: None,
    )
    sc = VisualScorer(
        dict(params, arcface=arc), bn, compute_dtype=jnp.float32,
        use_pallas=False, quantize="w8a8",
    )
    sc.calibrate(frames, refine_passes=1)
    got = np.asarray(load_exported(open(out, "rb").read()).call(
        jnp.asarray(frames), jnp.asarray(np.full((2,), 2, np.int32))
    ))
    np.testing.assert_allclose(got, sc.score(frames), atol=1e-6)


def test_av_scorer_and_fused_export():
    """AVScorer = alpha-convex fusion of the two engines (config-5 serving),
    and export_av bakes BOTH backbones into one artifact whose output equals
    the live fused score."""
    from multimodal_deepfake_detection_tpu.models.export import export_av
    from multimodal_deepfake_detection_tpu.models.serve import AVScorer

    vp, vbn = xception_lstm_init(jax.random.PRNGKey(30), 8)
    vp["arcface"] = arcface_init(jax.random.PRNGKey(31), 8, 2)
    ap, abn = xception_lstm_init(jax.random.PRNGKey(32), 8)
    vis = VisualScorer(vp, vbn, compute_dtype=jnp.float32, use_pallas=False)
    aud = AudioScorer(ap, abn, compute_dtype=jnp.float32, use_pallas=False)
    av = AVScorer(vis, aud, alpha=0.7)

    B, T, L = 2, 2, 1600
    frames = np.random.default_rng(20).integers(0, 255, (B, T, 64, 64, 3), np.uint8)
    waves = np.sin(np.linspace(0, 90, B * L)).reshape(B, L).astype(np.float32)

    got = av.score(frames, waves)
    ref = 0.7 * vis.score(frames) + 0.3 * aud.score(waves)
    np.testing.assert_allclose(got, ref, atol=1e-6)

    blob = export_av(av, T=T, H=64, W=64, num_samples=L)
    prog = load_exported(blob)
    hop = aud.mfcc_kw["hop_length"]
    out = np.asarray(prog.call(
        jnp.asarray(frames),
        jnp.asarray(np.full((B,), T, np.int32)),
        jnp.asarray(waves),
        jnp.asarray(np.full((B,), 1 + L // hop, np.int32)),
    ))
    np.testing.assert_allclose(out, got, atol=1e-6)


def test_export_interpret_pinned_to_target_platform():
    """Pallas-routed quant modes: the interpret flag bakes into the artifact,
    so it must track the export TARGET (platforms=...), not the exporting
    host. From this CPU host: cpu target -> interpret lowering (replayable
    here); mixed cpu+tpu target -> rejected."""
    import pytest

    sc = _visual_scorer(quantize="w8a8-pallas")
    frames = np.random.default_rng(11).integers(0, 255, (2, 2, 64, 64, 3), np.uint8)
    sc.calibrate(frames)

    # explicit cpu target from the cpu host: works and replays here
    blob = export_visual(sc, T=2, H=64, W=64, batch=2, platforms=["cpu"])
    got = np.asarray(load_exported(blob).call(
        jnp.asarray(frames), jnp.asarray(np.full((2,), 2, np.int32))
    ))
    np.testing.assert_allclose(got, sc.score(frames), atol=1e-6)
    # the override is restored after export (live scoring still works)
    assert sc._force_pallas_interpret is None
    sc.score(frames)

    # mixed target with a Pallas-routed mode is an explicit error
    with pytest.raises(ValueError, match="Pallas-routed"):
        export_visual(sc, T=2, H=64, W=64, batch=2, platforms=["cpu", "tpu"])
