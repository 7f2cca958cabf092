"""Bucket dispatch on every serving engine: bounded compiles, unchanged scores.

VERDICT r2 item 5: AudioScorer jitted once per distinct waveform length and
AUFaceScorer/AUPatchScorer once per distinct (T, A) — each new shape a fresh
multi-second remote compile at serve time. With buckets, mixed-length traffic
must compile a bounded program set (asserted via the jit cache size) and
produce the same scores as the unbucketed engines.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.au_face import au_face_detector_init
from multimodal_deepfake_detection_tpu.models.heads import xception_lstm_init
from multimodal_deepfake_detection_tpu.models.resnet_lstm import au_patch_classifier_init
from multimodal_deepfake_detection_tpu.models.serve import (
    AudioScorer,
    AUFaceScorer,
    AUPatchScorer,
    reset_score_jit_cache,
)

RNG = np.random.default_rng(0)


def test_audio_scorer_buckets_bounded_and_exact():
    reset_score_jit_cache()  # compile counts must not see other tests' programs
    params, bn_state = xception_lstm_init(jax.random.PRNGKey(2), 8)
    kw = dict(compute_dtype=jnp.float32, use_pallas=False)
    plain = AudioScorer(params, bn_state, **kw)
    bucketed = AudioScorer(params, bn_state, sample_buckets=(3200, 6400), **kw)
    # same config -> the scoring programs are SHARED across instances
    # (models/serve.py::_shared_score_jit); cache sizes below are per-config
    assert bucketed._score is plain._score

    lengths = [2400, 3200, 4000, 4800, 6400]  # 5 distinct -> 2 bucket shapes
    centered0 = plain._score._cache_size()
    uncentered0 = bucketed._score_uncentered._cache_size()
    for L in lengths:
        plain.score(RNG.normal(0, 0.1, (2, L)).astype(np.float32))
    # unbucketed traffic compiles once per distinct length — what buckets solve
    assert plain._score._cache_size() == centered0 + len(lengths)
    centered_after = plain._score._cache_size()
    for L in lengths:
        wav = RNG.normal(0, 0.1, (2, L)).astype(np.float32)
        got = bucketed.score(wav)
        np.testing.assert_allclose(got, plain.score(wav), rtol=1e-5, atol=1e-6)
    # bucketed traffic: 2 uncentered bucket shapes, centered path never used
    assert bucketed._score_uncentered._cache_size() == uncentered0 + 2
    assert plain._score._cache_size() == centered_after


def test_audio_scorer_buckets_fidelity_mode_exact():
    params, bn_state = xception_lstm_init(jax.random.PRNGKey(3), 8)
    kw = dict(compute_dtype=jnp.float32, use_pallas=False, mask_padding=False)
    plain = AudioScorer(params, bn_state, **kw)
    bucketed = AudioScorer(params, bn_state, sample_buckets=(4800,), **kw)
    wav = RNG.normal(0, 0.1, (2, 3300)).astype(np.float32)
    np.testing.assert_allclose(bucketed.score(wav), plain.score(wav), rtol=1e-5, atol=1e-6)


def _au_face_scorer(buckets=None):
    params, bn_state = au_face_detector_init(
        jax.random.PRNGKey(0), num_aus=3, face_dim=8, au_dim=8, lstm_hidden=4
    )
    return AUFaceScorer(params, bn_state, compute_dtype=jnp.float32, buckets=buckets)


def test_au_face_scorer_buckets_bounded_and_exact():
    reset_score_jit_cache()  # compile counts must not see other tests' programs
    plain = _au_face_scorer()
    bucketed = _au_face_scorer(buckets=(4, 6))
    assert bucketed._score is plain._score  # config-shared program

    shapes = [(2, 3), (3, 4), (4, 2), (5, 6), (6, 5)]  # (T, Ta) pairs
    n0 = plain._score._cache_size()
    for T, Ta in shapes:
        videos = RNG.integers(0, 255, (2, T, 16, 16, 3), np.uint8)
        patches = RNG.integers(0, 255, (2, Ta, 3, 8, 8, 3), np.uint8)
        weights = RNG.random((2, Ta, 3)).astype(np.float32)
        ref = plain.score(videos, patches, au_weight=weights)
    # unbucketed traffic: one compile per distinct (T, Ta)
    assert plain._score._cache_size() == n0 + len(shapes)
    n1 = plain._score._cache_size()
    for T, Ta in shapes:
        videos = RNG.integers(0, 255, (2, T, 16, 16, 3), np.uint8)
        patches = RNG.integers(0, 255, (2, Ta, 3, 8, 8, 3), np.uint8)
        weights = RNG.random((2, Ta, 3)).astype(np.float32)
        got = bucketed.score(videos, patches, au_weight=weights)
        ref = plain.score(videos, patches, au_weight=weights)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # 5 distinct (T, Ta) pairs collapse to <= 4 (Tb, Tab) bucket pairs
    assert plain._score._cache_size() <= n1 + 4


def test_au_patch_scorer_buckets_bounded_and_exact():
    reset_score_jit_cache()  # compile counts must not see other tests' programs
    params, bn_state = au_patch_classifier_init(jax.random.PRNGKey(1), hidden_dim=8, lstm_hidden=4)
    kw = dict(compute_dtype=jnp.float32)
    plain = AUPatchScorer(params, bn_state, **kw)
    bucketed = AUPatchScorer(params, bn_state, buckets=(4, 8), **kw)

    assert bucketed._score is plain._score  # config-shared program
    n0 = plain._score._cache_size()
    for T in (2, 3, 4, 6, 8):
        patches = RNG.integers(0, 255, (2, T, 3, 8, 8, 3), np.uint8)
        weights = RNG.random((2, T, 3)).astype(np.float32)
        ref = plain.score(patches, weights)
    assert plain._score._cache_size() == n0 + 5  # one compile per distinct T
    n1 = plain._score._cache_size()
    for T in (2, 3, 4, 6, 8):
        patches = RNG.integers(0, 255, (2, T, 3, 8, 8, 3), np.uint8)
        weights = RNG.random((2, T, 3)).astype(np.float32)
        got = bucketed.score(patches, weights)
        ref = plain.score(patches, weights)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # the 2 bucket shapes (T=4, T=8) were ALREADY compiled by the plain loop
    # and the program is config-shared, so bucketed traffic adds zero compiles
    assert plain._score._cache_size() == n1


def test_au_patch_scorer_buckets_ragged_lengths():
    """Per-row lengths below T stay masked correctly through the bucket pad."""
    params, bn_state = au_patch_classifier_init(jax.random.PRNGKey(4), hidden_dim=8, lstm_hidden=4)
    patches = RNG.integers(0, 255, (2, 5, 3, 8, 8, 3), np.uint8)
    weights = RNG.random((2, 5, 3)).astype(np.float32)
    lengths = np.array([5, 3], np.int32)
    plain = AUPatchScorer(params, bn_state, compute_dtype=jnp.float32)
    bucketed = AUPatchScorer(params, bn_state, compute_dtype=jnp.float32, buckets=(8,))
    np.testing.assert_allclose(
        bucketed.score(patches, weights, lengths),
        plain.score(patches, weights, lengths),
        rtol=1e-4, atol=1e-5,
    )
