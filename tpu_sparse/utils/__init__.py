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
