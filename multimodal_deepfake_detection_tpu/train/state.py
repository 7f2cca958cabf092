"""Train-state pytrees.

A ``TrainState`` is a NamedTuple (hence automatically a pytree): it moves
whole through ``jit``/``pjit``, checkpoints as one object (unlike the
reference, whose best-only ``state_dict`` saves lose optimizer/scheduler
state and cannot resume mid-run — SURVEY.md §5 'Checkpoint / resume').

``EmaState`` reproduces torch ``AveragedModel``'s *equal-weight running
average* (avg += (p - avg)/(n+1)) — the EMA flavor train_au_face evaluates
and checkpoints (``/root/reference/train_au_face.py:595,691-692``). An
exponential-decay variant is available for quality mode.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any
    count: jnp.ndarray  # int32 scalar — number of updates folded in


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    bn_state: Any
    opt_state: Any
    ema: Optional[EmaState] = None


def ema_init(params) -> EmaState:
    # materialize copies — aliasing params' buffers would break donation
    return EmaState(jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params), jnp.zeros((), jnp.int32))


def ema_update(ema: EmaState, params, *, decay: Optional[float] = None) -> EmaState:
    """Equal-weight running average by default; exponential if ``decay`` given."""
    if decay is None:
        n = ema.count.astype(jnp.float32)
        new = jax.tree_util.tree_map(lambda a, p: a + (p.astype(a.dtype) - a) / (n + 1.0), ema.params, params)
    else:
        new = jax.tree_util.tree_map(lambda a, p: decay * a + (1 - decay) * p.astype(a.dtype), ema.params, params)
    return EmaState(new, ema.count + 1)
