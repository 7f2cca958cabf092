"""Artifact-backed serving (models/artifact.py): exported programs behind
the live engines' score() API, bucket-dispatched, wired into cli/serve.py
(--artifact) and the micro-batching daemon.

Contract pinned here: (a) structural engine detection from the artifact's
calling convention, (b) per-engine score() equality vs the live bucketed
scorer for mixed lengths, (c) static-batch artifacts pad+slice, (d) the
error surfaces (engine mismatch, no covering au_face bucket, oversize B),
(e) the checkpoint-free CLI and daemon paths score real files/requests.
The torch reference has no serving artifact at all (its eval scripts reload
nn.Modules from source per run, /root/reference/test_visual.py:572-608).
"""
import io
import json
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.artifact import (
    ArtifactScorer,
    detect_engine,
    load_artifact_scorer,
)
from multimodal_deepfake_detection_tpu.models.export import (
    export_au_face,
    export_au_patch,
    export_audio,
    export_av,
    export_visual,
    load_exported,
)
from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
from multimodal_deepfake_detection_tpu.models.serve import (
    AudioScorer,
    AUFaceScorer,
    AUPatchScorer,
    AVScorer,
    VisualScorer,
)

RNG = np.random.default_rng(0)


def _visual_scorer(**kw):
    params, bn = xception_lstm_init(jax.random.PRNGKey(0), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(1), 8, 2)
    return VisualScorer(params, bn, compute_dtype=jnp.float32, use_pallas=False, **kw)


def _frames(B, T, s=32, seed=1):
    return np.random.default_rng(seed).integers(0, 255, (B, T, s, s, 3), np.uint8)


def test_visual_bucket_dispatch_matches_live():
    live = _visual_scorer(buckets=(2, 4))
    blobs = [export_visual(live, T=t, H=32, W=32) for t in (2, 4)]
    art = ArtifactScorer(blobs)
    assert art.engine == "visual" and art.buckets == [(2,), (4,)]
    for T in (1, 2, 3, 4):
        x = _frames(2, T, seed=T)
        np.testing.assert_allclose(art.score(x), live.score(x), atol=1e-6)
    # longer than the largest bucket: truncate (live collate contract)
    x = _frames(2, 6, seed=9)
    np.testing.assert_allclose(art.score(x), live.score(x), atol=1e-6)
    # explicit short lengths ride through
    x = _frames(3, 4, seed=10)
    lens = np.array([4, 2, 1], np.int32)
    np.testing.assert_allclose(art.score(x, lens), live.score(x, lens), atol=1e-6)


def test_static_batch_artifact_pads_and_slices():
    live = _visual_scorer()
    art = ArtifactScorer(export_visual(live, T=2, H=32, W=32, batch=4))
    x = _frames(2, 2, seed=3)
    np.testing.assert_allclose(art.score(x), live.score(x), atol=1e-6)
    with pytest.raises(ValueError, match="static batch"):
        art.score(_frames(5, 2, seed=4))


def test_engine_detection_and_mismatch_errors():
    live = _visual_scorer()
    blob = export_visual(live, T=2, H=32, W=32)
    assert detect_engine(load_exported(blob)) == "visual"
    with pytest.raises(ValueError, match="expected a 'audio' artifact"):
        load_artifact_scorer(blob, engine="audio")
    with pytest.raises(ValueError, match="no artifacts"):
        ArtifactScorer([])


def test_manifest_roundtrip_and_legacy_fallback():
    """The .jaxprog container embeds a manifest (engine, bucket dims, quant,
    version); raw pre-manifest blobs stay loadable via structural detection."""
    from multimodal_deepfake_detection_tpu import __version__
    from multimodal_deepfake_detection_tpu.models.export import _unwrap, read_manifest

    live = _visual_scorer()
    blob = export_visual(live, T=2, H=32, W=32)
    m = read_manifest(blob)
    assert m == {
        "format": 1, "version": __version__, "engine": "visual",
        "T": 2, "H": 32, "W": 32, "quant": None,
    }
    x = _frames(2, 2, seed=7)
    want = live.score(x)
    np.testing.assert_allclose(ArtifactScorer(blob).score(x), want, atol=1e-6)

    # legacy raw blob (no container): manifest absent, detection fallback works
    raw = _unwrap(blob)
    assert read_manifest(raw) is None
    art = ArtifactScorer(raw)
    assert art.engine == "visual"
    np.testing.assert_allclose(art.score(x), want, atol=1e-6)

    # corrupt container: manifest/engine disagreement is rejected
    from multimodal_deepfake_detection_tpu.models.export import _wrap

    wrapped_as_audio = _wrap(raw, {"engine": "audio"})
    assert read_manifest(wrapped_as_audio)["engine"] == "audio"
    with pytest.raises(ValueError, match="corrupt artifact"):
        ArtifactScorer(wrapped_as_audio)

    # audio manifests carry the export hop_length; the scorer defaults to it
    params, bn = xception_lstm_init(jax.random.PRNGKey(5), 8)
    aud = AudioScorer(params, bn, compute_dtype=jnp.float32, use_pallas=False)
    ablob = export_audio(aud, 1600)
    am = read_manifest(ablob)
    assert am["engine"] == "audio" and am["hop_length"] == aud.mfcc_kw["hop_length"]
    assert ArtifactScorer(ablob).hop_length == aud.mfcc_kw["hop_length"]


def test_audio_artifact_matches_live_full_length():
    params, bn = xception_lstm_init(jax.random.PRNGKey(2), 8)
    live = AudioScorer(params, bn, compute_dtype=jnp.float32, use_pallas=False)
    L = 1600
    art = ArtifactScorer(export_audio(live, L), hop_length=live.mfcc_kw["hop_length"])
    assert art.engine == "audio"
    waves = np.sin(np.linspace(0, 70, 2 * L)).reshape(2, L).astype(np.float32)
    np.testing.assert_allclose(art.score(waves), live.score(waves), atol=1e-6)
    # mixed durations: sample_lengths-derived frame masks make each row's
    # score independent of its batch mates (the live engine's host-side
    # re-centering remains the bit-exact mixed-duration path — documented)
    short = waves[1, : L // 2]
    mixed = np.stack([waves[0], np.concatenate([short, np.zeros(L - L // 2, np.float32)])])
    got = art.score(mixed, sample_lengths=np.array([L, L // 2]))
    solo_full = art.score(waves[:1])
    solo_short = art.score(short[None], sample_lengths=np.array([L // 2]))
    np.testing.assert_allclose(got[0], solo_full[0], atol=1e-6)
    np.testing.assert_allclose(got[1], solo_short[0], atol=1e-6)


def test_au_patch_artifact_matches_live():
    from multimodal_deepfake_detection_tpu.models.resnet_lstm import au_patch_classifier_init

    params, bn = au_patch_classifier_init(jax.random.PRNGKey(3), hidden_dim=8, lstm_hidden=8)
    live = AUPatchScorer(params, bn, compute_dtype=jnp.float32, buckets=(2, 4))
    blobs = [export_au_patch(live, T=t, A=2, patch_hw=(32, 32)) for t in (2, 4)]
    art = ArtifactScorer(blobs)
    assert art.engine == "au_patch"
    for T in (1, 3):
        p = np.random.default_rng(T).integers(0, 255, (2, T, 2, 32, 32, 3), np.uint8)
        np.testing.assert_allclose(art.score(p), live.score(p), atol=1e-6)
    with pytest.raises(ValueError, match="patch dims"):
        art.score(np.zeros((1, 2, 2, 16, 16, 3), np.uint8))


def test_au_face_artifact_exact_shape_only():
    from multimodal_deepfake_detection_tpu.models.au_face import au_face_detector_init

    params, bn = au_face_detector_init(
        jax.random.PRNGKey(4), num_aus=2, face_dim=8, au_dim=8, lstm_hidden=4
    )
    live = AUFaceScorer(params, bn, compute_dtype=jnp.float32)
    art = ArtifactScorer(
        export_au_face(live, T=2, Ta=2, A=2, face_hw=(32, 32), patch_hw=(32, 32))
    )
    assert art.engine == "au_face"
    vids = np.random.default_rng(5).integers(0, 255, (2, 2, 32, 32, 3), np.uint8)
    aus = np.random.default_rng(6).integers(0, 255, (2, 2, 2, 32, 32, 3), np.uint8)
    np.testing.assert_allclose(art.score(vids, aus), live.score(vids, aus), atol=1e-6)
    with pytest.raises(ValueError, match="valid-length gates"):
        art.score(vids[:, :1], aus)


def test_av_artifact_matches_live():
    vp, vbn = xception_lstm_init(jax.random.PRNGKey(30), 8)
    vp["arcface"] = arcface_init(jax.random.PRNGKey(31), 8, 2)
    ap, abn = xception_lstm_init(jax.random.PRNGKey(32), 8)
    live = AVScorer(
        VisualScorer(vp, vbn, compute_dtype=jnp.float32, use_pallas=False),
        AudioScorer(ap, abn, compute_dtype=jnp.float32, use_pallas=False),
        alpha=0.7,
    )
    B, T, L = 2, 2, 1600
    art = ArtifactScorer(
        export_av(live, T=T, H=32, W=32, num_samples=L),
        hop_length=live.audio.mfcc_kw["hop_length"],
    )
    assert art.engine == "av" and art.buckets == [(T, L)]
    frames = _frames(B, T, seed=20)
    waves = np.sin(np.linspace(0, 90, B * L)).reshape(B, L).astype(np.float32)
    np.testing.assert_allclose(
        art.score(frames, waves), live.score(frames, waves), atol=1e-6
    )


def test_serve_cli_artifact_checkpoint_free(tmp_path):
    """cli/serve.py --artifact scores .npy clips without any checkpoint."""
    from multimodal_deepfake_detection_tpu.cli import serve as serve_cli

    live = _visual_scorer(buckets=(2, 4))
    adir = tmp_path / "artifacts"
    adir.mkdir()
    for t in (2, 4):
        (adir / f"visual_T{t}.jaxprog").write_bytes(export_visual(live, T=t, H=32, W=32))
    clips = tmp_path / "clips"
    clips.mkdir()
    arrs = {f"c{i}": _frames(1, t, seed=40 + i)[0] for i, t in enumerate((2, 3, 4))}
    for name, a in arrs.items():
        np.save(clips / f"{name}.npy", a)
    out = tmp_path / "scores.jsonl"
    n = serve_cli.main(
        ["--engine", "visual", "--artifact", str(adir),
         "--input", str(clips), "--output", str(out), "--batch_size", "2"],
        log=lambda s: None,
    )
    assert n == 3
    recs = {json.loads(l)["path"]: json.loads(l)["score"] for l in out.read_text().splitlines()}
    assert len(recs) == 3
    for path, score in recs.items():
        stem = path.rsplit("/", 1)[-1][:-4]
        a = arrs[stem]
        ref = float(live.score(a[None], np.array([a.shape[0]], np.int32))[0])
        assert abs(score - ref) < 1e-5


def test_serve_cli_artifact_flag_conflicts(tmp_path):
    from multimodal_deepfake_detection_tpu.cli.serve import Config, _build_engine

    with pytest.raises(ValueError, match="baked at export"):
        _build_engine(Config(artifact="x.jaxprog", quantize="w8a8"), None)
    with pytest.raises(ValueError, match="per-shard"):
        _build_engine(Config(artifact="x.jaxprog"), object())


def test_daemon_serves_from_artifact(tmp_path):
    """serve_daemon --artifact: a checkpoint-free HTTP daemon whose scores
    match the live engine."""
    from multimodal_deepfake_detection_tpu.cli import serve_daemon

    live = _visual_scorer(buckets=(2,))
    path = tmp_path / "visual_T2.jaxprog"
    path.write_bytes(export_visual(live, T=2, H=32, W=32))
    started = []
    daemon = serve_daemon.main(
        ["--engine", "visual", "--artifact", str(path), "--port", "0",
         "--max_batch", "2", "--max_wait_ms", "5"],
        log=lambda s: None, started=started,
    )
    try:
        clip = _frames(1, 2, seed=50)[0]
        buf = io.BytesIO()
        np.savez(buf, frames=clip)
        req = urllib.request.Request(
            daemon.url + "/v1/score/visual", buf.getvalue(),
            {"Content-Type": "application/x-npz"},
        )
        rec = json.loads(urllib.request.urlopen(req, timeout=120).read())
        ref = float(live.score(clip[None])[0])
        assert abs(rec["score"] - ref) < 1e-5
    finally:
        daemon.stop()
