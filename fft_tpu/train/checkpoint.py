"""Checkpoint/resume via orbax (SURVEY §5: the reference has none; its
decode cache isn't even visible to state_dict).

Everything checkpointable here is a pytree of real-dtype arrays by
construction (params, optimizer state, RNG key, step, decode caches), so
save/restore is exact and sharding-aware (orbax restores to the sharding of
the provided abstract target).
"""

from __future__ import annotations

import pathlib
import threading
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(root) -> pathlib.Path:
    return pathlib.Path(root).absolute()


def _prune(root: pathlib.Path, keep: int) -> None:
    steps = sorted((int(p.name) for p in root.iterdir()
                    if p.is_dir() and p.name.isdigit()))
    for old in steps[:-keep]:
        import shutil
        shutil.rmtree(root / str(old), ignore_errors=True)


def save_checkpoint(root, state: Any, step: int, *, keep: int = 3) -> str:
    """Save ``state`` (any pytree) under root/<step>.  Returns the path."""
    root = _path(root)
    root.mkdir(parents=True, exist_ok=True)
    path = root / f"{step}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    _prune(root, keep)
    return str(path)


class AsyncCheckpointWriter:
    """Overlap checkpoint writes with training (SURVEY §5 design row:
    async checkpoints every k steps).

    ``save`` synchronously snapshots the state to host memory (the only
    part that must see a consistent view — device_get, milliseconds for
    donated-buffer training since XLA double-buffers), then serializes to
    disk on a background thread while the train loop keeps stepping.  At
    most one write is in flight; a second ``save`` first joins the
    previous write so checkpoints land in step order.  Call ``wait`` (or
    use as a context manager) before reading ``latest_step`` or exiting.
    """

    def __init__(self, root, *, keep: int = 3):
        self._root = _path(root)
        self._keep = keep
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, state: Any, step: int) -> None:
        self.wait()
        host = jax.tree.map(np.asarray, jax.device_get(state))
        self._root.mkdir(parents=True, exist_ok=True)

        def _write():
            try:
                with ocp.StandardCheckpointer() as ckptr:
                    ckptr.save(self._root / f"{step}", host, force=True)
                _prune(self._root, self._keep)
            except BaseException as e:   # surfaced on the next wait/save
                self._error = e

        # non-daemon: an in-flight write completes (or fails loudly on the
        # next wait) even if the caller exits without draining — a daemon
        # thread would be killed at interpreter shutdown, silently losing
        # the checkpoint
        self._thread = threading.Thread(target=_write, daemon=False)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        return False


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
