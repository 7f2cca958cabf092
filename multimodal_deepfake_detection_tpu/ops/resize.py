"""Bilinear resize with torch ``align_corners=False`` semantics.

The audio head upsamples each (13, 1) MFCC step to 64x64 before the backbone
(``/root/reference/XceptionLSTMA.py:46``: ``F.interpolate(..., mode='bilinear',
align_corners=False)``). ``jax.image.resize`` with ``antialias=False`` uses the
same half-pixel-center linear kernel, so outputs match torch to fp32 rounding.
Runs on-device and fuses into the surrounding jit region — no host round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw, *, channel_last: bool = True) -> jnp.ndarray:
    """Resize spatial dims of (..., H, W, C) [or (..., H, W) if channel_last=False]."""
    oh, ow = out_hw
    if channel_last:
        shape = x.shape[:-3] + (oh, ow, x.shape[-1])
    else:
        shape = x.shape[:-2] + (oh, ow)
    return jax.image.resize(x, shape, method="bilinear", antialias=False)
