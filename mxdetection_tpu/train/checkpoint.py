"""Checkpoint / resume via Orbax.

Reference equivalent (SURVEY.md §5.4): per-epoch ``mx.model.save_checkpoint``
(flat param dict + symbol json), resume restarts optimizer state. The rebuild
saves the FULL train state (params, optimizer, step, rng) every N steps, and
``latest_step`` enables ``--resume`` auto-detection. Models are small, so
saves are fully-replicated from process 0.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp

from .trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, force: bool = False) -> None:
        step = int(state.step)
        self.mgr.save(step, args=ocp.args.StandardSave(state._asdict()), force=force)
        self.mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def restore(self, state: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``state`` (shapes/shardings as built)."""
        step = step if step is not None else self.latest_step()
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(state._asdict()))
        return TrainState(**restored)
