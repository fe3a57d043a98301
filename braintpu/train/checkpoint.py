"""Training checkpoint / resume (orbax-backed).

The reference has no training and therefore no training checkpoints
(SURVEY.md §5 — its only checkpointing is loading the 10 pretrained torch
``.model`` files).  A production framework needs restartable training:
this module persists the full :class:`~braintpu.train.trainer.TrainState`
(params, optimizer state, step) atomically with orbax, keeps a bounded
history, and restores onto the current device/sharding layout.

Layout on disk::

    <dir>/
      <step>/...          orbax PyTree checkpoint per retained step
      (orbax metadata)

Use :func:`latest_step` + :func:`restore_train_state` to resume, or the
:func:`fit` loop in ``trainer.py`` which does both ends automatically.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax

__all__ = [
    "save_train_state",
    "restore_train_state",
    "latest_step",
    "CheckpointManager",
]


def _manager(directory: os.PathLike, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        ),
    )


class CheckpointManager:
    """Thin lifetime wrapper so callers don't deal with orbax directly."""

    def __init__(self, directory: os.PathLike, max_to_keep: int = 3):
        self.directory = Path(directory)
        self._mgr = _manager(directory, max_to_keep)

    def save(self, state, step: Optional[int] = None) -> int:
        import orbax.checkpoint as ocp

        step = int(state.step) if step is None else int(step)
        self._mgr.save(step, args=ocp.args.PyTreeSave(_as_tree(state)))
        self._mgr.wait_until_finished()
        return step

    def restore(self, template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else int(step)
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(_as_tree(template))
        )
        return _from_tree(template, restored)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()


def _as_tree(state) -> Any:
    """TrainState (NamedTuple with arbitrary opt pytrees) → plain pytree."""
    flat, treedef = jax.tree_util.tree_flatten(state)
    return {"leaves": list(flat)}


def _from_tree(template, restored) -> Any:
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = restored["leaves"]
    if len(leaves) != len(flat):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has {len(flat)} — "
            "architecture/optimizer mismatch"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_state(directory: os.PathLike, state, max_to_keep: int = 3) -> int:
    """One-shot save; returns the step saved under."""
    mgr = CheckpointManager(directory, max_to_keep)
    try:
        return mgr.save(state)
    finally:
        mgr.close()


def latest_step(directory: os.PathLike) -> Optional[int]:
    if not Path(directory).exists():
        return None
    mgr = CheckpointManager(directory)
    try:
        return mgr.latest_step()
    finally:
        mgr.close()


def restore_train_state(directory: os.PathLike, template, step: Optional[int] = None):
    """Restore into the structure (and shardings) of ``template``.

    Returns the restored TrainState, or None if the directory has no
    checkpoints.
    """
    mgr = CheckpointManager(directory)
    try:
        return mgr.restore(template, step)
    finally:
        mgr.close()
