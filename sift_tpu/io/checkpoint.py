"""Checkpoint / resume (SURVEY.md §5: the reference has none; the build
checkpoints map state for resumable incremental SfM and restart-based
recovery).

Orbax-backed: any pytree (MapState, BAState, pipeline dicts) saves with
per-shard async write on multi-host meshes. Restore takes an abstract
target (same-structure pytree of ShapeDtypeStruct or arrays) so sharded
restores land directly on the right devices.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree checkpoint to `path` (a directory)."""
    ckpt = _checkpointer()
    ckpt.save(os.path.abspath(path), state, force=force)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint.

    `target` (optional): a pytree of arrays or ShapeDtypeStructs giving the
    structure/sharding to restore into; without it the raw saved tree comes
    back.
    """
    ckpt = _checkpointer()
    if target is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, target)
        return ckpt.restore(os.path.abspath(path), abstract)
    return ckpt.restore(os.path.abspath(path))


class CheckpointManager:
    """Step-numbered checkpoint rotation (keep the last N)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None,
                target: Optional[Any] = None) -> Any:
        import orbax.checkpoint as ocp
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError("no checkpoint found")
        if target is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape") else x, target)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
