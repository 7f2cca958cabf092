"""Learning-rate schedules.

* ``PlateauScheduler`` — host-side ReduceLROnPlateau with torch semantics
  (mode=min, relative threshold 1e-4, cooldown 0): the scheduler every live
  reference loop uses (``/root/reference/train_audio.py:22``,
  ``train_visual.py:534``, ``train_au_patch.py:218``). Paired with
  ``optim.set_learning_rate`` to poke the new LR into the optimizer state
  between epochs — the jitted step itself never recompiles.
* ``onecycle_schedule`` — optax cosine one-cycle matching torch
  ``OneCycleLR(max_lr, pct_start, anneal='cos', div_factor=25,
  final_div_factor=1e4)`` (``/root/reference/train_au_face.py:620-623``).
"""
from __future__ import annotations

import optax


class PlateauScheduler:
    def __init__(
        self,
        init_lr: float,
        *,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 5,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        assert mode in ("min", "max")
        self.lr = float(init_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad = 0

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed the epoch metric; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


def onecycle_schedule(
    max_lr: float,
    total_steps: int,
    *,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    # optax's onecycle NaNs when a phase rounds to zero steps (tiny runs);
    # clamp so warmup and cooldown each span >= 1 step.
    total_steps = max(int(total_steps), 4)
    pct_start = min(max(pct_start, 1.0 / total_steps), 1.0 - 1.0 / total_steps)
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )
