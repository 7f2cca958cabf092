"""Orbax-backed train-state checkpointing (preemption-safe resume).

The npz snapshots in :mod:`.checkpoint` are simple and dependable; this module
provides the Orbax alternative SURVEY.md §5 calls for — versioned step
directories with atomic finalization (a partially-written checkpoint is never
restored after preemption), rolling retention, and sharding-aware restore on
multi-chip meshes. Use via ``--ckpt_backend orbax`` on the train CLIs or
directly:

    mgr = OrbaxStateManager(dir, max_to_keep=3)
    mgr.save(step, train_state)
    state = mgr.restore_latest(like=train_state)
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


class OrbaxStateManager:
    def __init__(self, directory: str, *, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(int(step), args=self._ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, *, like: Any) -> Optional[Any]:
        """Restore the newest checkpoint into the structure/shardings of
        ``like``; None if the directory has no finished checkpoints."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "dtype")
            else x,
            like,
        )
        return self._mgr.restore(step, args=self._ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()
