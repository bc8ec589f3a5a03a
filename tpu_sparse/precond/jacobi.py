"""Diagonal (Jacobi) preconditioner + jit-safe diagonal extraction."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from tpu_sparse.sparse.containers import BSR, COO, CSR, DIA


def diagonal(A) -> jax.Array:
    """Extract diag(A) for any container / dense matrix (jit-safe)."""
    if isinstance(A, DIA):
        if 0 in A.offsets:
            return A.data[A.offsets.index(0)]
        return jnp.zeros(A.shape[0], A.dtype)
    if isinstance(A, CSR):
        rows = A.row_ids()
        mask = (A.indices == rows).astype(A.dtype)
        return jax.ops.segment_sum(A.data * mask, rows,
                                   num_segments=A.shape[0])
    if isinstance(A, COO):
        mask = (A.row == A.col).astype(A.dtype)
        return jnp.zeros(A.shape[0], A.dtype).at[A.row].add(A.data * mask)
    if isinstance(A, BSR):
        coo = A.tocoo()
        return diagonal(coo)
    return jnp.diagonal(A)


def _apply_diag(dinv: jax.Array, v):
    return jax.tree_util.tree_map(lambda leaf: dinv * leaf, v)


def jacobi_preconditioner(A) -> Partial:
    """M ≈ A⁻¹ as inverse-diagonal scaling. Returned as a
    `jax.tree_util.Partial` so it rides through jit/custom_vjp as a pytree."""
    d = diagonal(A)
    dinv = jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 1.0)
    return Partial(_apply_diag, dinv)


def l1_jacobi_diag(A) -> jax.Array:
    """L1-Jacobi smoother diagonal: d_i = Σ_j |a_ij| (row L1 norm),
    matching the AMGX JACOBI_L1 smoother the reference configures
    (torch_amgx.py:50-73)."""
    if isinstance(A, DIA):
        return jnp.sum(jnp.abs(A.data), axis=0)
    if isinstance(A, CSR):
        rows = A.row_ids()
        return jax.ops.segment_sum(jnp.abs(A.data), rows,
                                   num_segments=A.shape[0])
    if isinstance(A, COO):
        return jnp.zeros(A.shape[0], A.dtype).at[A.row].add(jnp.abs(A.data))
    return jnp.sum(jnp.abs(A), axis=1)
