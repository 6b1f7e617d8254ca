"""Checkpoint/resume for inverse-rendering training state.

The reference's closest analog is the MManager session that persists GPU
uploads across mex calls (reference src/C/vr/mm/mmanager.hxx:28-93) —
process-lifetime only. Here training state (params pytree + optimizer
state + step counter) round-trips to a single ``.npz`` file, so long
reconstructions survive preemption. Pytrees are flattened with jax's
key paths, so any optax optimizer state serializes without custom code.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, params, opt_state, step: int) -> None:
    """Atomically write (params, opt_state, step) to ``path`` (.npz)."""
    payload = {}
    for prefix, tree in (("params", params), ("opt", opt_state)):
        for key, arr in _flatten(tree).items():
            payload[f"{prefix}{key}"] = arr
    payload["__step__"] = np.asarray(step, np.int64)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_like, opt_state_like) -> Tuple[Any, Any, int]:
    """Load a checkpoint into the STRUCTURE of the given example pytrees.

    The examples (e.g. freshly initialized params/opt_state) define the
    tree structure; leaf values are replaced from the file. Raises
    KeyError if the file does not match the structure.
    """
    with np.load(path) as data:
        def restore(prefix, tree):
            leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
            new_leaves = []
            for p, leaf in leaves_with_paths:
                key = f"{prefix}{jax.tree_util.keystr(p)}"
                if key not in data:
                    raise KeyError(
                        f"checkpoint {path} has no entry {key!r}; structure "
                        f"mismatch with the provided example pytree")
                arr = data[key]
                new_leaves.append(
                    jax.numpy.asarray(arr).astype(leaf.dtype)
                    if hasattr(leaf, "dtype") else arr)
            return jax.tree_util.tree_unflatten(treedef, new_leaves)

        params = restore("params", params_like)
        opt_state = restore("opt", opt_state_like)
        step = int(data["__step__"])
    return params, opt_state, step
