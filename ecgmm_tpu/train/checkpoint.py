"""Checkpointing: orbax-backed best/last/epochN saves + exact resume.

The reference torch.saves bare state dicts each epoch and cannot resume
optimizer state or loop counters (`/root/reference/train.py:142-149`).
Here the whole TrainState PyTree is saved atomically; `best`/`last`
aliases mirror the reference's artifact names so downstream eval keeps the
same contract (test best.pth then last.pth, train.py:174-336).

Saves are ASYNCHRONOUS (SURVEY §5): ``save()`` snapshots the state to host
memory synchronously — so donated/overwritten device buffers can't be read
after the fact — then hands the actual orbax write to a single background
writer thread, overlapping disk/serialization with the next training
epoch. All writes are serialized in submission order; ``wait_until_
finished()`` drains the queue and re-raises any writer error. ``restore``
and ``exists`` drain first, so read-after-write is always consistent. The
SIGTERM/preemption path uses ``block=True`` (engine.py) — durability beats
overlap when the process is about to die.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, List

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep_epochs: int = 3,
                 async_saves: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.keep_epochs = keep_epochs
        self.async_saves = async_saves
        # Seed the retention window from epochN dirs already on disk so
        # a resumed run keeps garbage-collecting its predecessor's
        # checkpoints instead of only the ones this process creates.
        existing = sorted(
            (
                d for d in os.listdir(self.directory)
                if d.startswith("epoch") and d[5:].isdigit()
                and os.path.isdir(os.path.join(self.directory, d))
            ),
            key=lambda d: int(d[5:]),
        )
        self._epoch_paths: List[str] = [
            os.path.join(self.directory, d) for d in existing
        ]
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._pending: List[Future] = []

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    # -- background writer ------------------------------------------------

    def _submit(self, fn, *args) -> None:
        self._pending.append(self._executor.submit(fn, *args))

    def wait_until_finished(self) -> None:
        """Drain queued writes; re-raise the first writer error. ALL
        futures are awaited before raising — clearing the queue on the
        first error would drop still-running writes from tracking and a
        caller that catches the error could then read a checkpoint the
        writer thread is mid-rewrite on."""
        pending, self._pending = self._pending, []
        first_err: Any = None
        for fut in pending:
            try:
                fut.result()
            except BaseException as e:
                if first_err is None:
                    first_err = e
        if first_err is not None:
            raise first_err

    def _write(self, name: str, host_state: Any,
               overwrite: bool = True) -> None:
        self._ckptr.save(self._path(name), host_state, force=overwrite)
        self._ckptr.wait_until_finished()

    # -- public API --------------------------------------------------------

    def save(self, name: str, state: Any, overwrite: bool = True,
             block: bool = False):
        if self.async_saves and not block:
            # Backpressure: each queued save holds a full host snapshot
            # (params + optimizer moments); with epochs faster than disk
            # writes (the cached-embedding fast path) an unbounded queue
            # accumulates gigabytes. Bound in-flight snapshots to 2.
            while len(self._pending) >= 2:
                self._pending.pop(0).result()
        # Synchronous device→host snapshot: after this, training may donate
        # or overwrite the device buffers freely.
        host_state = jax.device_get(state)
        if self.async_saves and not block:
            self._submit(self._write, name, host_state, overwrite)
        else:
            self.wait_until_finished()
            self._write(name, host_state, overwrite)

    def save_epoch(self, epoch: int, state: Any):
        """epochN checkpoint with a retention window (the reference keeps
        every improving epochN.pth; we bound disk use). Retention deletes
        run on the writer thread too, preserving write→delete order."""
        name = f"epoch{epoch}"
        self.save(name, state)
        self._epoch_paths.append(self._path(name))
        while len(self._epoch_paths) > self.keep_epochs:
            old = self._epoch_paths.pop(0)
            if self.async_saves:
                self._submit(shutil.rmtree, old, True)
            else:
                shutil.rmtree(old, ignore_errors=True)

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure/shardings of `target`."""
        self.wait_until_finished()
        return self._ckptr.restore(self._path(name), target=target)

    def exists(self, name: str) -> bool:
        self.wait_until_finished()
        return os.path.isdir(self._path(name))

    def close(self) -> None:
        self.wait_until_finished()
        self._executor.shutdown(wait=True)
