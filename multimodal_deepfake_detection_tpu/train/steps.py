"""Jitted train/eval step builders.

A CLI supplies a pure ``loss_forward`` and gets back compiled steps that
thread the full TrainState (params, BN stats, optimizer, optional EMA)
through one XLA program. Freezing is gradient masking under jit — the
reference's ``requires_grad=False`` flips (``/root/reference/train_visual.py:551-556``)
become a static ``frozen_keys`` tuple selecting which top-level param subtrees
get zero gradients (note torch semantics preserved: a frozen backbone still
runs BN in batch-stats mode during training and keeps updating running stats).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import TrainState, ema_update


def mask_frozen(grads: dict, frozen_keys: Sequence[str]) -> dict:
    if not frozen_keys:
        return grads
    out = dict(grads)
    for k in frozen_keys:
        if k in out:
            out[k] = jax.tree_util.tree_map(jnp.zeros_like, out[k])
    return out


def make_train_step(
    loss_forward: Callable,
    tx: optax.GradientTransformation,
    *,
    use_ema: bool = False,
    ema_decay: Optional[float] = None,
):
    """Build a jitted train step.

    ``loss_forward(params, bn_state, rng, batch) -> (loss, (new_bn_state, probs))``
    where ``batch`` is the (inputs, labels, lengths) tuple. The returned step is
    ``step(state, batch, rng_seed, frozen_keys=()) -> (state, loss, probs)``
    with ``frozen_keys`` static (one compile per freeze configuration).
    """
    grad_fn = jax.value_and_grad(loss_forward, has_aux=True)

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def step(state: TrainState, batch, rng_seed, frozen_keys: Tuple[str, ...] = ()):
        rng = jax.random.fold_in(jax.random.PRNGKey(0), rng_seed)
        (loss, (new_bn, probs)), grads = grad_fn(state.params, state.bn_state, rng, batch)
        grads = mask_frozen(grads, frozen_keys)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = None
        if use_ema and state.ema is not None:
            # With gradient accumulation (MultiSteps), fold into the EMA only on
            # real optimizer steps — the reference updates its AveragedModel per
            # step, not per micro-batch (/root/reference/train_au_face.py:688-692).
            if hasattr(new_opt, "mini_step"):
                did_step = new_opt.mini_step == 0
                new_ema = jax.tree_util.tree_map(
                    lambda upd, keep: jnp.where(did_step, upd, keep),
                    ema_update(state.ema, new_params, decay=ema_decay),
                    state.ema,
                )
            else:
                new_ema = ema_update(state.ema, new_params, decay=ema_decay)
        return (
            TrainState(state.step + 1, new_params, new_bn, new_opt, new_ema),
            loss,
            probs,
        )

    return step


def make_eval_step(eval_forward: Callable, *, use_ema_params: bool = False):
    """Build a jitted eval step: ``(state, batch) -> (loss, probs)``.

    ``eval_forward(params, bn_state, batch) -> (loss, probs)`` runs with BN in
    running-stats mode and dropout off. ``use_ema_params`` evaluates with the
    averaged weights — the reference's EMA-eval pattern
    (``/root/reference/train_au_face.py:708-732``).
    """

    @jax.jit
    def step(state: TrainState, batch):
        params = state.ema.params if (use_ema_params and state.ema is not None) else state.params
        loss, probs = eval_forward(params, state.bn_state, batch)
        return loss, probs

    return step
