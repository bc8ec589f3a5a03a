"""Pytree linear-algebra helpers.

The reference carries a full pytree clone for torch
(module_a/torch_tree_util.py:31-392). On JAX, `jax.tree_util` *is* the pytree
library, so this module only provides the vector-space helpers the solvers
need (tree vdot / norm / axpy), built on the native tree machinery.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

tree_map = jax.tree_util.tree_map
tree_leaves = jax.tree_util.tree_leaves
tree_flatten = jax.tree_util.tree_flatten
tree_unflatten = jax.tree_util.tree_unflatten
tree_structure = jax.tree_util.tree_structure
tree_reduce = jax.tree_util.tree_reduce
Partial = jax.tree_util.Partial


def _vdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision vdot of two equally-shaped arrays (conj on a)."""
    return jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)


def tree_vdot(a: Any, b: Any) -> jax.Array:
    """<a, b> summed over every leaf (conjugate-linear in ``a``)."""
    leaves_a = tree_leaves(a)
    leaves_b = tree_leaves(b)
    return sum(_vdot(la, lb) for la, lb in zip(leaves_a, leaves_b))


def tree_vdot_real(a: Any, b: Any) -> jax.Array:
    """Real part of <a, b>; matches the reference's `_vdot_real_tree`
    (torch_sparse_linalg.py:100-127 / torch_tree_util.py:318-357)."""
    out = tree_vdot(a, b)
    return jnp.real(out)


def tree_norm(x: Any) -> jax.Array:
    """Global 2-norm over all leaves."""
    return jnp.sqrt(tree_vdot_real(x, x))


def tree_add(a: Any, b: Any) -> Any:
    return tree_map(jnp.add, a, b)


def tree_sub(a: Any, b: Any) -> Any:
    return tree_map(jnp.subtract, a, b)


def tree_scalar_mul(s: jax.Array, x: Any) -> Any:
    return tree_map(lambda leaf: s * leaf, x)


def tree_axpy(a: jax.Array, x: Any, y: Any) -> Any:
    """a*x + y, leafwise."""
    return tree_map(lambda xl, yl: a * xl + yl, x, y)


def tree_zeros_like(x: Any) -> Any:
    return tree_map(jnp.zeros_like, x)


def tree_where(pred: jax.Array, a: Any, b: Any) -> Any:
    return tree_map(partial(jnp.where, pred), a, b)


def tree_size(x: Any) -> int:
    """Total number of elements across all leaves (static)."""
    return sum(leaf.size for leaf in tree_leaves(x))
