"""Checkpoint/resume via orbax (SURVEY §5: the reference has none; its
decode cache isn't even visible to state_dict).

Everything checkpointable here is a pytree of real-dtype arrays by
construction (params, optimizer state, RNG key, step, decode caches), so
save/restore is exact and sharding-aware (orbax restores to the sharding of
the provided abstract target).
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(root) -> pathlib.Path:
    return pathlib.Path(root).absolute()


def save_checkpoint(root, state: Any, step: int, *, keep: int = 3) -> str:
    """Save ``state`` (any pytree) under root/<step>.  Returns the path."""
    root = _path(root)
    root.mkdir(parents=True, exist_ok=True)
    path = root / f"{step}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    # prune old checkpoints
    steps = sorted((int(p.name) for p in root.iterdir()
                    if p.is_dir() and p.name.isdigit()))
    for old in steps[:-keep]:
        import shutil
        shutil.rmtree(root / str(old), ignore_errors=True)
    return str(path)


def latest_step(root) -> Optional[int]:
    root = _path(root)
    if not root.exists():
        return None
    steps = [int(p.name) for p in root.iterdir()
             if p.is_dir() and p.name.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(root, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``target`` (a concrete or
    abstract pytree).  ``step=None`` -> latest."""
    root = _path(root)
    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(root / str(step), abstract)
