"""Checkpointing: orbax-backed best/last/epochN saves + exact resume.

The reference torch.saves bare state dicts each epoch and cannot resume
optimizer state or loop counters (`/root/reference/train.py:142-149`).
Here the whole TrainState PyTree is saved atomically; `best`/`last`
aliases mirror the reference's artifact names so downstream eval keeps the
same contract (test best.pth then last.pth, train.py:174-336).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep_epochs: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep_epochs = keep_epochs
        self._epoch_paths = []

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any, overwrite: bool = True):
        path = self._path(name)
        self._ckptr.save(path, state, force=overwrite)
        self._ckptr.wait_until_finished()

    def save_epoch(self, epoch: int, state: Any):
        """epochN checkpoint with a retention window (the reference keeps
        every improving epochN.pth; we bound disk use)."""
        name = f"epoch{epoch}"
        self.save(name, state)
        self._epoch_paths.append(self._path(name))
        while len(self._epoch_paths) > self.keep_epochs:
            old = self._epoch_paths.pop(0)
            try:
                ocp.path.utils.rmtree(old)  # type: ignore[attr-defined]
            except Exception:
                import shutil

                shutil.rmtree(old, ignore_errors=True)

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure/shardings of `target`."""
        return self._ckptr.restore(self._path(name), target=target)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
