"""Checkpoint/resume for long renders and inverse optimization.

SURVEY.md §5.4: the reference's only persistence is settings/URL state; the
TPU build's real checkpointing need is (a) the inverse-rendering optimizer
state (InverseParams + Adam moments) and (b) accumulation buffers of long
multi-host supersampling sweeps. Orbax is the backend when available (the
production path); a .npz fallback keeps the API alive everywhere.

API: ``save_checkpoint(path, tree)`` / ``load_checkpoint(path, like=tree)``
round-trip any pytree of arrays, plus ``CheckpointManager`` for step-indexed
training checkpoints with retention.
"""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

try:  # orbax is the preferred backend
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    _HAVE_ORBAX = False


def _flatten_with_names(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, tree) -> str:
    """Save a pytree of arrays. Uses orbax when available (directory
    checkpoint), else a single .npz of the flattened leaves."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
        return path
    flat, _ = _flatten_with_names(tree)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path + ".npz", **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
    return path + ".npz"


def load_checkpoint(path: str, like):
    """Load a checkpoint saved by ``save_checkpoint``. ``like`` provides the
    tree structure (and, for orbax, the restore template)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=like)
        return jax.tree.map(jnp.asarray, restored)
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    flat, treedef = _flatten_with_names(like)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """Step-indexed checkpoints with retention — the orbax CheckpointManager
    idea reduced to this project's needs (resume an interrupted inverse
    optimization or accumulation sweep at the latest step)."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)(?:\.npz)?", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(set(out))

    def save(self, step: int, tree) -> str:
        path = save_checkpoint(self._step_path(step), tree)
        self._retain()
        return path

    def restore_latest(self, like):
        steps = self.steps()
        if not steps:
            return None, None
        step = steps[-1]
        return step, load_checkpoint(self._step_path(step), like)

    def _retain(self) -> None:
        steps = self.steps()
        for old in steps[: -self.keep] if self.keep > 0 else []:
            p = self._step_path(old)
            if os.path.isdir(p):
                import shutil

                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p + ".npz"):
                os.remove(p + ".npz")
