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
        import os

        # orbax's tensorstore layer REJECTS relative paths at save time
        # (deep inside the async write, after the manager happily
        # initialized) — a relative --work_dir used to crash the first
        # epoch checkpoint. Normalize here.
        self.mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: TrainState, metadata: Optional[dict] = None):
        self.mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state._asdict()),
            **({"meta": ocp.args.JsonSave(metadata)} if metadata else {})))
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def all_steps(self):
        return sorted(self.mgr.all_steps())

    def resolve(self, spec: str = "latest") -> Optional[int]:
        """Map a reference-style checkpoint spec to a step index.

        Ref `evaluate.py:92,149` selects `--modelCheckPoint latest|epoch_N`;
        here 'latest' -> newest step, 'epoch_N' -> the step whose saved
        metadata records epoch N, and a bare integer selects that step
        directly. Raises FileNotFoundError when the spec matches nothing.
        """
        if spec in (None, "latest"):
            return self.mgr.latest_step()
        if spec.startswith("epoch_"):
            want = int(spec[len("epoch_"):])
            for step in self.all_steps():
                meta = self.metadata(step)
                if meta and meta.get("epoch") == want:
                    return step
            raise FileNotFoundError(
                f"no checkpoint for {spec} (have steps {self.all_steps()})")
        step = int(spec)
        if step not in self.mgr.all_steps():
            raise FileNotFoundError(
                f"no checkpoint step {step} (have {self.all_steps()})")
        return step

    def metadata(self, step: int) -> Optional[dict]:
        try:
            restored = self.mgr.restore(
                step, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
            return restored.get("meta")
        except Exception:
            return None

    def restore(self, state_like: TrainState, step: Optional[int] = None
                ) -> TrainState:
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self.mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(state_like._asdict())))
        return TrainState(**restored["state"])
