from tpu_sparse.utils import tree
from tpu_sparse.utils.tree import (
    tree_add,
    tree_axpy,
    tree_norm,
    tree_scalar_mul,
    tree_size,
    tree_sub,
    tree_vdot,
    tree_vdot_real,
    tree_where,
    tree_zeros_like,
)

__all__ = [
    "tree", "tree_add", "tree_axpy", "tree_norm", "tree_scalar_mul",
    "tree_size", "tree_sub", "tree_vdot", "tree_vdot_real", "tree_where",
    "tree_zeros_like",
]

from tpu_sparse.utils import timing  # noqa: E402
from tpu_sparse.utils import checkpoint  # noqa: E402


def compute_residual(A, x, b):
    """r = b - A x (reference matrix_utils.py:260-279)."""
    from tpu_sparse.kernels import as_matvec
    from tpu_sparse.utils.tree import tree_sub

    return tree_sub(b, as_matvec(A)(x))


def relative_residual(A, x, b):
    """‖b - Ax‖ / ‖b‖ (reference matrix_utils.py:281-303)."""
    import jax.numpy as jnp

    from tpu_sparse.utils.tree import tree_norm

    r = tree_norm(compute_residual(A, x, b))
    bn = tree_norm(b)
    return r / jnp.where(bn > 0, bn, 1.0)
