"""Checkpoint/resume via Orbax — a subsystem the reference entirely lacks
(no torch.save/load anywhere; `.gitignore` lists `checkpoints/` but nothing
writes it — SURVEY.md §5).

Saves the full sharded TrainState pytree (params + BatchNorm stats + Adam
state + step + RNG) asynchronously; on restore, arrays land back on their
recorded shardings (single-chip states restore fine on a mesh and vice versa
via the abstract-target API).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True),
    )


def save_checkpoint(directory: str, step: int, state: Any,
                    max_to_keep: int = 3, wait: bool = False) -> None:
    """Async-save `state` under `directory/<step>`. Set wait=True to block
    (e.g. final save before exit)."""
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


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
    target_step = step if step is not None else mgr.latest_step()
    if target_step is None:
        mgr.close()
        return state
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    restored = mgr.restore(target_step,
                           args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored


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
    directory = os.path.abspath(directory)
    mgr = _manager(directory)
    target_step = step if step is not None else mgr.latest_step()
    if target_step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    restored = mgr.restore(target_step, args=ocp.args.StandardRestore())
    mgr.close()
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
