"""Input-gradient saliency maps — the Grad-CAM analog (SURVEY.md §5).

The reference names an ``EVM_AU_GradCAM_Model`` interpretability variant
(``/root/reference/train_au_face.py:54``) whose class body does not exist
anywhere in the repo. The TPU-native analog is simpler and stronger: the
model is a pure function, so per-pixel attribution is one ``jax.grad`` of the
fake score with respect to the input frames — no hooks, no activation
capture, and it jits into a single XLA program alongside the forward.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


def input_saliency(score_fn: Callable, frames: jnp.ndarray, *args) -> jnp.ndarray:
    """Per-pixel saliency of ``score_fn`` w.r.t. ``frames``.

    ``score_fn(frames, *args) -> (B,) scores`` (e.g. fake probabilities or
    logits). Returns ``|d sum(score) / d frames|`` max-reduced over the channel
    axis — shape ``frames.shape[:-1]``. Gradients of independent samples don't
    mix, so summing scores gives every sample its own attribution in one
    backward pass.
    """
    grads = jax.grad(lambda v: jnp.sum(score_fn(v, *args)))(frames)
    return jnp.max(jnp.abs(grads.astype(jnp.float32)), axis=-1)


def normalize_map(sal: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Min-max normalize each (..., H, W) map independently to [0, 1]."""
    sal = np.asarray(sal, np.float32)
    lo = sal.min(axis=(-2, -1), keepdims=True)
    hi = sal.max(axis=(-2, -1), keepdims=True)
    return (sal - lo) / np.maximum(hi - lo, eps)


def save_saliency_grid(
    frames: np.ndarray,
    sal: np.ndarray,
    path: str,
    *,
    scores: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    max_samples: int = 4,
    max_frames: int = 6,
    log=print,
) -> str:
    """Overlay saliency heatmaps on frames and save a PNG grid.

    ``frames`` (B, T, H, W, 3) in [0, 1]; ``sal`` (B, T, H, W). One row per
    sample, one column per frame, jet overlay at 45% alpha.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames = np.asarray(frames, np.float32)
    sal = normalize_map(sal)
    B = min(frames.shape[0], max_samples)
    T = min(frames.shape[1], max_frames)
    fig, axes = plt.subplots(B, T, figsize=(2.2 * T, 2.4 * B), squeeze=False)
    for i in range(B):
        for t in range(T):
            ax = axes[i][t]
            ax.imshow(np.clip(frames[i, t], 0, 1))
            ax.imshow(sal[i, t], cmap="jet", alpha=0.45)
            ax.set_xticks([])
            ax.set_yticks([])
            if t == 0:
                title = f"sample {i}"
                if labels is not None:
                    title += f" y={int(labels[i])}"
                if scores is not None:
                    title += f" p={float(scores[i]):.2f}"
                ax.set_ylabel(title, fontsize=8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=160)
    plt.close(fig)
    log(f"[Saliency] saved -> {path}")
    return path
