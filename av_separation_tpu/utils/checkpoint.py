"""Checkpoint/resume via Orbax — a subsystem the reference entirely lacks
(no torch.save/load anywhere; `.gitignore` lists `checkpoints/` but nothing
writes it — SURVEY.md §5).

Saves the full sharded TrainState pytree (params + BatchNorm stats + Adam
state + step + RNG) asynchronously; on restore, arrays land back on their
recorded shardings (single-chip states restore fine on a mesh and vice versa
via the abstract-target API).

One `CheckpointManager` is kept alive per directory for the life of the
process: the async save thread it owns is what lets a mid-training save
overlap the next steps.  (Building a fresh manager per save and closing it
immediately would block on the async write — `close()` waits — turning every
"async" save into a synchronous one.)  Call `wait_until_finished()` /
`close_all()` only at exit.
"""

from __future__ import annotations

import atexit
import os
import threading
from typing import Any, Dict, Optional, Tuple

import jax

_managers: Dict[Tuple[str, int], Any] = {}
_managers_lock = threading.Lock()


def _manager(directory: str, max_to_keep: int = 3):
    """Return the process-wide CheckpointManager for `directory` (created on
    first use, kept open so async saves actually overlap training)."""
    import orbax.checkpoint as ocp
    key = (os.path.abspath(directory), max_to_keep)
    with _managers_lock:
        mgr = _managers.get(key)
        if mgr is None:
            mgr = ocp.CheckpointManager(
                key[0],
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True,
                    enable_async_checkpointing=True),
            )
            _managers[key] = mgr
        return mgr


def close_all() -> None:
    """Flush and close every open manager (called automatically at exit)."""
    with _managers_lock:
        for mgr in _managers.values():
            try:
                mgr.wait_until_finished()
                mgr.close()
            except Exception:
                pass
        _managers.clear()


atexit.register(close_all)


def save_checkpoint(directory: str, step: int, state: Any,
                    max_to_keep: int = 3, wait: bool = False) -> None:
    """Async-save `state` under `directory/<step>`; returns as soon as the
    on-device arrays are snapshotted so training continues while the write
    completes in the background.  Set wait=True to block (final save)."""
    import orbax.checkpoint as ocp
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def wait_until_finished(directory: str) -> None:
    """Block until any in-flight async save for `directory` has landed."""
    key = (os.path.abspath(directory), 3)
    with _managers_lock:
        for (d, _), mgr in _managers.items():
            if d == key[0]:
                mgr.wait_until_finished()


def restore_checkpoint(directory: str, state: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of `state` (pass the freshly
    initialized TrainState as the abstract target). Returns the restored
    state, or `state` unchanged if no checkpoint exists."""
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return state
    mgr = _manager(directory)
    mgr.wait_until_finished()
    target_step = step if step is not None else mgr.latest_step()
    if target_step is None:
        return state
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    return mgr.restore(target_step, args=ocp.args.StandardRestore(abstract))


def restore_variables(directory: str, model_cfg: Any = None,
                      step: Optional[int] = None) -> dict:
    """Restore just the model variables ({'params', 'batch_stats'}) for
    inference/serving — no optimizer state, no abstract target needed.

    Orbax restores the saved TrainState as plain nested dicts when no
    target is given; we extract the two collections the forward pass needs.
    `model_cfg` is accepted (and ignored) so callers can keep a uniform
    signature; restored shapes are whatever was trained.
    """
    import orbax.checkpoint as ocp
    mgr = _manager(directory)
    mgr.wait_until_finished()
    target_step = step if step is not None else mgr.latest_step()
    if target_step is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    restored = mgr.restore(target_step, args=ocp.args.StandardRestore())
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}


def latest_step(directory: str) -> Optional[int]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    return mgr.latest_step()
