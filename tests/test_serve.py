"""Serving engines: folded+fused inference must match the live-BN eval path."""
import numpy as np

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.heads import (
    arcface_apply,
    arcface_init,
    xception_lstm_embed,
    xception_lstm_features,
    xception_lstm_head_apply,
    xception_lstm_init,
)
from multimodal_deepfake_detection_tpu.models.serve import AudioScorer, VisualScorer
from multimodal_deepfake_detection_tpu.ops.mfcc import mfcc


def test_visual_scorer_matches_eval_path():
    params, bn_state = xception_lstm_init(jax.random.PRNGKey(0), 8)
    params["arcface"] = arcface_init(jax.random.PRNGKey(1), 8, 2)
    frames = np.random.default_rng(0).integers(0, 255, (2, 3, 64, 64, 3), np.uint8)
    lengths = np.array([3, 2], np.int32)

    scorer = VisualScorer(params, bn_state, compute_dtype=jnp.float32, use_pallas=False)
    got = scorer.score(frames, lengths)

    feats, _ = xception_lstm_features(
        params, bn_state, jnp.asarray(frames, jnp.float32) / 255.0, mode="video", train=False
    )
    emb = xception_lstm_embed(params, feats, lengths=jnp.asarray(lengths))
    ref = jax.nn.softmax(arcface_apply(params["arcface"], emb, None), -1)[:, 1]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_audio_scorer_from_waveform():
    params, bn_state = xception_lstm_init(jax.random.PRNGKey(2), 8)
    wav = np.random.default_rng(1).normal(0, 0.1, (2, 4800)).astype(np.float32)

    scorer = AudioScorer(params, bn_state, compute_dtype=jnp.float32, use_pallas=False)
    got = scorer.score(wav)
    assert got.shape == (2,)
    assert np.isfinite(got).all() and (got >= 0).all() and (got <= 1).all()

    # equals scoring the precomputed-MFCC path (the offline pipeline contract)
    steps = np.asarray(mfcc(jnp.asarray(wav)))  # (2, T, 13)
    tripled = np.repeat(steps[:, :, None, :], 3, axis=2)  # (2, T, 3, 13)
    feats, _ = xception_lstm_features(params, bn_state, jnp.asarray(tripled), mode="audio", train=False)
    ref = xception_lstm_head_apply(params, feats)[:, 0]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-3, atol=1e-4)
