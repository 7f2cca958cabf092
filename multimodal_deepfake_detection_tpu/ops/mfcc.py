"""On-device MFCC frontend (waveform -> (T, n_mfcc)), librosa-compatible.

The reference extracts MFCCs offline on the host with
``librosa.feature.mfcc(y, sr=16000, n_mfcc=13, n_fft=400, hop_length=160)``
(``/root/reference/wavfake_audio_dataset.py:18-19,43``). This module computes
the identical pipeline as jit-able device math so audio preprocessing can fuse
into the model's forward (BASELINE.json north-star: decode-to-logits without
host round-trips):

    center-pad (reflect) -> frame -> periodic Hann window -> rFFT power
    -> slaney mel filterbank (n_mels=128, area-normalized) -> power_to_db
    (ref=1, amin=1e-10, top_db=80) -> orthonormal DCT-II -> first n_mfcc

Every matrix (mel filterbank, DCT) is a precomputed constant, so the whole
frontend is two matmuls + an FFT on the MXU/VPU. Frame count matches librosa's
``1 + floor(len(y) / hop)`` with centering.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=8)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: Optional[float] = None, htk: bool = False
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) slaney-normalized triangular filters (librosa.filters.mel)."""
    fmax = fmax or sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


@lru_cache(maxsize=8)
def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """(n_mfcc, n_mels) orthonormal DCT-II (scipy.fft.dct(type=2, norm='ortho'))."""
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels)) * math.sqrt(2.0 / n_mels)
    mat[0] *= 1.0 / math.sqrt(2.0)
    return mat.astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int, *, center: bool = True) -> jnp.ndarray:
    """(..., samples) -> (..., frames, n_fft) with librosa reflect centering."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode="reflect")
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[..., idx]


def power_to_db(S: jnp.ndarray, *, amin: float = 1e-10, top_db: Optional[float] = 80.0) -> jnp.ndarray:
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    if top_db is not None:
        # per-spectrogram max over the trailing two axes (librosa: global max)
        max_val = jnp.max(log_spec, axis=tuple(range(log_spec.ndim - 2, log_spec.ndim)), keepdims=True)
        log_spec = jnp.maximum(log_spec, max_val - top_db)
    return log_spec


def mfcc(
    y: jnp.ndarray,
    *,
    sr: int = 16000,
    n_mfcc: int = 13,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    top_db: Optional[float] = 80.0,
    center: bool = True,
) -> jnp.ndarray:
    """Waveform (..., samples) float -> MFCC (..., frames, n_mfcc).

    Matches ``librosa.feature.mfcc(...).T`` (the reference transposes to
    time-major at ``wavfake_audio_dataset.py:44``). ``center=False`` skips the
    reflect pre-pad — for callers that pad on the host (the bucketed serving
    path, models/serve.py): reflect-padding the true signal there and framing
    uncentered here makes every frame of the original length bit-identical
    under zero-padding to a static bucket.
    """
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length, center=center)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))  # periodic Hann
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    power = jnp.abs(spec).astype(jnp.float32) ** 2
    mel = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk))
    mel_spec = power @ mel.T  # (..., frames, n_mels)
    db = power_to_db(mel_spec, top_db=top_db)
    return db @ jnp.asarray(dct_matrix(n_mfcc, n_mels)).T
