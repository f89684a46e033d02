"""Checkpoint / resume for training state.

The reference has no training loop and hence no checkpointing
(SURVEY.md §5.4); this framework trains, so it saves. Params are pure
pytrees (``models/llama.py``), which makes Orbax's standard checkpointer
sufficient — sharded arrays restore with their shardings when a mesh is
live, and quantized leaves (``QuantizedWeight``) round-trip through their
registered pytree form.
"""

from __future__ import annotations

import os
from typing import Any

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _step_dir(path: str, step: int) -> str:
    return os.path.join(os.path.abspath(path), f"step_{step:08d}")


def save_checkpoint(path: str, state: Any, step: int) -> str:
    """Save a pytree ``state`` under ``path/step_XXXXXXXX``. Returns the dir."""
    d = _step_dir(path, step)
    ckpt = _checkpointer()
    ckpt.save(d, state, force=True)
    ckpt.wait_until_finished()
    return d


def latest_step(path: str) -> int | None:
    """Highest step number saved under ``path`` (None if empty/missing)."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(path: str, template: Any, step: int | None = None) -> Any:
    """Restore the pytree saved at ``step`` (default: latest).

    ``template`` is a pytree of like-shaped arrays (or ShapeDtypeStructs,
    possibly with shardings attached) directing placement on restore.
    """
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path!r}")
    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        template,
    )
    return _checkpointer().restore(_step_dir(path, step), target)
