"""Checkpoint helpers for long-running (distributed) solves.

The reference has no save/resume at all (SURVEY.md §5 — simulations run
start-to-finish). For multi-hour distributed runs this module provides a
minimal pytree checkpoint: leaves to a single .npz keyed by tree path,
restored into the structure of a template pytree (so static metadata like
shapes/offsets never leaves the program).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _path_key(path) -> str:
    return "/".join(str(p) for p in path)


def save_pytree(path: str, tree: Any) -> str:
    """Save all array leaves of ``tree`` to ``path`` (.npz)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_key(p): np.asarray(v) for p, v in flat}
    np.savez(path, **arrays)
    return path


def load_pytree(path: str, like: Any) -> Any:
    """Load a checkpoint into the structure of ``like`` (same treedef)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, v in flat:
        key = _path_key(p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        loaded = data[key]
        tmpl_shape = tuple(getattr(v, "shape", np.shape(v)))
        tmpl_dtype = np.dtype(getattr(v, "dtype", np.asarray(v).dtype))
        if tuple(loaded.shape) != tmpl_shape:
            raise ValueError(
                f"checkpoint leaf {key} has shape {tuple(loaded.shape)}, "
                f"template expects {tmpl_shape} (different grid size?)")
        if np.dtype(loaded.dtype) != tmpl_dtype:
            raise ValueError(
                f"checkpoint leaf {key} has dtype {loaded.dtype}, "
                f"template expects {tmpl_dtype} (different precision?)")
        leaves.append(jax.numpy.asarray(loaded))
    paths_treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(paths_treedef, leaves)
