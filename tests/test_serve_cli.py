"""Serve CLI: batch JSONL scoring over the engines (the deployment surface)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.cli import serve
from multimodal_deepfake_detection_tpu.core.checkpoint import save_bundle
from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
from multimodal_deepfake_detection_tpu.models.resnet_lstm import au_patch_classifier_init


@pytest.fixture(scope="module")
def visual_bundle(tmp_path_factory):
    params, bn_state = xception_lstm_init(jax.random.PRNGKey(0), 8)
    arc = arcface_init(jax.random.PRNGKey(1), 8, 2)
    path = str(tmp_path_factory.mktemp("b") / "visual.npz")
    save_bundle(path, {"model": params, "arcface": arc, "state": bn_state})
    return path


def test_serve_visual_npy_and_video(visual_bundle, tmp_path):
    rng = np.random.default_rng(0)
    inp = tmp_path / "clips"
    inp.mkdir()
    np.save(inp / "a.npy", (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8))
    np.save(inp / "b.npy", (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8))
    # a real video file through the native/cv2 decode route
    from multimodal_deepfake_detection_tpu.data import native_video

    wrote_video = False
    try:
        native_video._load_av_lib()
        frames = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
        wrote_video = native_video.encode_test_video(str(inp / "c.mp4"), frames) > 0
    except ImportError:
        pass

    out = tmp_path / "scores.jsonl"
    n = serve.main(
        [
            "--engine", "visual",
            "--ckpt_path", visual_bundle,
            "--input", str(inp),
            "--output", str(out),
            "--hidden_dim", "8",
            "--batch_size", "2",
            "--max_frames", "5",
            "--frame_size", "32",
            "--buckets", "5",
            "--compute_dtype", "float32",
        ],
        log=lambda s: None,
    )
    assert n == 2 + int(wrote_video)
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == n
    assert all(0.0 <= r["score"] <= 1.0 and "fake" in r for r in recs)
    assert {os.path.basename(r["path"]) for r in recs} >= {"a.npy", "b.npy"}


def test_serve_au_patch(tmp_path):
    params, bn_state = au_patch_classifier_init(jax.random.PRNGKey(2), hidden_dim=8, lstm_hidden=4)
    bundle = str(tmp_path / "aup.npz")
    save_bundle(bundle, {"model": params, "state": bn_state})
    rng = np.random.default_rng(1)
    inp = tmp_path / "patches"
    inp.mkdir()
    for name, t in (("x", 3), ("y", 4)):
        np.save(inp / f"{name}.npy", (rng.random((t, 3, 8, 8, 3)) * 255).astype(np.uint8))
        np.save(inp / f"{name}_weights.npy", rng.random((t, 3)).astype(np.float32))
    out = tmp_path / "s.jsonl"
    n = serve.main(
        [
            "--engine", "au_patch",
            "--ckpt_path", bundle,
            "--input", str(inp),
            "--output", str(out),
            "--patch_hidden", "8",
            "--patch_lstm_hidden", "4",
            "--batch_size", "2",
            "--buckets", "4",
            "--compute_dtype", "float32",
        ],
        log=lambda s: None,
    )
    assert n == 2
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert all(np.isfinite(r["score"]) for r in recs)


def test_serve_au_face(tmp_path):
    from multimodal_deepfake_detection_tpu.models.au_face import au_face_detector_init

    params, bn_state = au_face_detector_init(
        jax.random.PRNGKey(3), num_aus=3, face_dim=8, au_dim=8, lstm_hidden=4
    )
    bundle = str(tmp_path / "auf.npz")
    save_bundle(bundle, {"model": params, "state": bn_state})
    rng = np.random.default_rng(2)
    vroot, aroot = tmp_path / "faces", tmp_path / "aus"
    vroot.mkdir()
    aroot.mkdir()
    for name, t in (("p", 3), ("q", 2)):
        np.save(vroot / f"{name}.npy", (rng.random((t, 16, 16, 3)) * 255).astype(np.uint8))
        np.save(aroot / f"{name}.npy", (rng.random((t, 3, 8, 8, 3)) * 255).astype(np.uint8))
    out = tmp_path / "f.jsonl"
    n = serve.main(
        [
            "--engine", "au_face",
            "--ckpt_path", bundle,
            "--input", str(vroot),
            "--au_input", str(aroot),
            "--output", str(out),
            "--num_aus", "3",
            "--lstm_hidden", "4",
            "--batch_size", "2",
            "--buckets", "4",
            "--compute_dtype", "float32",
        ],
        log=lambda s: None,
    )
    assert n == 2
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert all(np.isfinite(r["score"]) for r in recs)


def test_serve_av_paired(visual_bundle, tmp_path):
    """engine=av: visual npys paired with waveform npys/wavs by stem, fused
    JSONL scores = alpha*p_v + (1-alpha)*p_a."""
    from multimodal_deepfake_detection_tpu.models.heads import xception_lstm_init

    ap, abn = xception_lstm_init(jax.random.PRNGKey(7), 8)
    audio_bundle = str(tmp_path / "audio.npz")
    save_bundle(audio_bundle, {"model": ap, "state": abn})

    rng = np.random.default_rng(3)
    vin = tmp_path / "clips"
    ain = tmp_path / "waves"
    vin.mkdir(), ain.mkdir()
    for stem in ("real_a", "fake_b"):
        np.save(vin / f"{stem}.npy", (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8))
        np.save(ain / f"{stem}.npy", rng.standard_normal(1600).astype(np.float32))

    out = tmp_path / "av.jsonl"
    n = serve.main(
        [
            "--engine", "av",
            "--ckpt_path", visual_bundle,
            "--audio_ckpt_path", audio_bundle,
            "--input", str(vin),
            "--audio_input", str(ain),
            "--output", str(out),
            "--hidden_dim", "8",
            "--audio_hidden", "8",
            "--av_alpha", "0.7",
            "--batch_size", "2",
            "--buckets", "4",
            "--sample_buckets", "1600",
            "--compute_dtype", "float32",
        ],
        log=lambda s: None,
    )
    assert n == 2
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert all(0.0 <= r["score"] <= 1.0 for r in recs)
