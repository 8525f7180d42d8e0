"""Checkpointing — orbax, step-indexed, with a latest pointer.

Replaces the reference's torch save/load + `latest.pth` symlink
(`det3d/torchie/trainer/trainer.py:362-376`, `checkpoint.py:42-216`,
`CheckpointHook`).
"""
from __future__ import annotations

from typing import Optional

import orbax.checkpoint as ocp

from .step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: TrainState, metadata: Optional[dict] = None):
        self.mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state._asdict()),
            **({"meta": ocp.args.JsonSave(metadata)} if metadata else {})))
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None
                ) -> TrainState:
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self.mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(state_like._asdict())))
        return TrainState(**restored["state"])
