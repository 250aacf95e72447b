"""Checkpoint / resume via orbax (async), replacing ``torch.save`` (C8).

Saves params + optimizer state + PRNG key + step.  Because sampling keys are
counter-based threefry keys stored in the state, restoring reproduces the
exact training stream the run would have seen [SURVEY.md §5 "Checkpoint"].
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, state) -> None:
        self._mgr.save(
            int(state.step), args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state))
        )

    def latest_step(self) -> Optional[int]:
        """Newest saved step number, or None (no restore; cheap metadata read)."""
        return self._mgr.latest_step()

    def restore_latest(self, template):
        """Restore the newest checkpoint shaped like ``template`` (or None)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
