"""Optimizer construction (optax) with the reference's training mechanics.

Composes, in order: global-norm gradient clipping
(``/root/reference/train_visual.py:575``: clip 1.0 after unscale), the Adam /
AdamW core, a host-settable or scheduled learning rate, and optional
k-step gradient accumulation (``accum_steps=4`` in train_au_face —
``/root/reference/train_au_face.py:678-693``).

Note on accumulation semantics: torch-style ``backward()`` accumulation *sums*
the k per-micro-batch mean gradients; ``optax.MultiSteps`` *averages* them.
Averaging is the standard large-batch semantics, so it is the default here;
fidelity with the reference's effective k-times-larger step is recovered by
scaling the LR by ``accum_steps`` (documented per-CLI).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import optax


def make_optimizer(
    name: str = "adam",
    learning_rate: Union[float, Callable] = 1e-4,
    *,
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    if name == "adam":
        core = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
        if weight_decay:
            # torch Adam(weight_decay=wd) is L2-regularized Adam (decay added
            # to the gradient BEFORE the moment updates), not AdamW.
            core = optax.chain(optax.add_decayed_weights(weight_decay), core)
    elif name == "adamw":
        core = optax.inject_hyperparams(optax.adamw)(learning_rate=learning_rate, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(core)
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def _find_hyperparams(opt_state):
    """Depth-first search for an InjectHyperparamsState inside nested optax state."""
    if hasattr(opt_state, "hyperparams") and isinstance(getattr(opt_state, "hyperparams"), dict):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            found = _find_hyperparams(s)
            if found is not None:
                return found
    if hasattr(opt_state, "inner_opt_state"):
        return _find_hyperparams(opt_state.inner_opt_state)
    if hasattr(opt_state, "inner_state"):
        return _find_hyperparams(opt_state.inner_state)
    return None


def get_learning_rate(opt_state) -> float:
    node = _find_hyperparams(opt_state)
    if node is None:
        raise ValueError("no injected hyperparams in optimizer state")
    return float(node.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return a copy of ``opt_state`` with the injected learning rate replaced.

    Works through chain/MultiSteps nesting. Host-side only (between epochs).
    """
    node = _find_hyperparams(opt_state)
    if node is None:
        raise ValueError("no injected hyperparams in optimizer state")
    import jax.numpy as jnp

    target = node.hyperparams["learning_rate"]

    def replace(x):
        if x is target:
            return jnp.asarray(lr, jnp.asarray(x).dtype)
        return x

    return jax.tree_util.tree_map(replace, opt_state)
