"""Explicit RNG threading.

The reference seeds torch/numpy globals (``/root/reference/train_au_face.py:414-419``);
JAX threads keys explicitly. ``RngStream`` is a tiny helper that hands out
fresh subkeys, so call sites stay linear and deterministic for a given seed.
"""
from __future__ import annotations

import jax


class RngStream:
    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
