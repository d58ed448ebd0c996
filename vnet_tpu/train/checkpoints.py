"""Checkpoint/resume via orbax.

Semantics parity with the reference Saver flow (SURVEY.md §5.4,
`/root/reference/model.py:689-702, 758-764, 806-808`): checkpoints keyed by
global step, a "latest" pointer, epoch counter stored *inside* the state so
resume continues epochs, and bounded retention.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = True):
        """``async_save=True`` (default): ``save`` returns as soon as the
        state is snapshotted; serialization to disk overlaps subsequent
        training steps (orbax AsyncCheckpointer). Call
        ``wait_until_finished()``/``close()`` before reading the files."""
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: Any, step: Optional[int] = None) -> None:
        step = int(state.step) if step is None else int(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> Optional[Any]:
        """Restore the newest checkpoint into the structure of ``template``;
        None if the directory has no checkpoints."""
        self._mgr.wait_until_finished()  # settle any in-flight async save
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore(self, step: int, template: Any) -> Any:
        self._mgr.wait_until_finished()
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore_latest_partial(self, subtree: Any) -> Optional[Any]:
        """Restore only the keys present in ``subtree`` (e.g.
        ``{"params": ..., "batch_stats": ...}``) from the newest
        checkpoint. Evaluation restores weights without the optimizer
        state, so a checkpoint trained with a different optimizer (or an
        optax state-layout change) can still be evaluated."""
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                        subtree)
        return self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(item=target,
                                              partial_restore=True))

    def close(self):
        self._mgr.close()
