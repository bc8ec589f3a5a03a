"""Flexible conjugate gradients (FCG).

Standard CG requires a fixed symmetric preconditioner; a nonsymmetric or
iteration-varying M (AMG V(0,3) cycles, inner iterative solves) breaks its
recurrence — observed in this repo as stagnation just above tolerance.
FCG (Notay's variant) replaces the Fletcher-Reeves beta with the
Polak-Ribière form, which re-orthogonalizes against the previous direction
and tolerates variable preconditioning at the cost of one extra dot
product per iteration.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tpu_sparse.kernels import as_matvec
from tpu_sparse.solvers.krylov import (
    _check_tree_compat,
    _default_maxiter,
    _final_check_relax,
    _float_dtype,
    _identity,
    _real_dtype,
)
from tpu_sparse.utils.tree import (
    tree_axpy,
    tree_norm,
    tree_sub,
    tree_vdot_real,
    tree_zeros_like,
)


class _FCGState(NamedTuple):
    x: Any
    r: Any
    z: Any
    p: Any
    rz: jax.Array
    k: jax.Array


def fcg_full(A, b, x0: Optional[Any] = None, *, tol: float = 1e-5,
             atol: float = 0.0, maxiter: Optional[int] = None, M=None):
    """Flexible CG returning (x, info, iterations, residual_norm)."""
    if x0 is None:
        x0 = tree_zeros_like(b)
    _check_tree_compat(x0, b)
    maxiter = _default_maxiter(b, maxiter)
    A_fn = as_matvec(A)
    M_fn = _identity if M is None else as_matvec(M)

    bs = tree_vdot_real(b, b)
    atol2 = jnp.maximum(jnp.square(tol) * bs, jnp.square(atol))
    dtype = _float_dtype(b)

    r0 = tree_sub(b, A_fn(x0))
    z0 = M_fn(r0)
    rz0 = tree_vdot_real(r0, z0)

    def cond(s: _FCGState):
        rs = tree_vdot_real(s.r, s.r)
        return (s.k < maxiter) & (rs > atol2)

    def body(s: _FCGState):
        q = A_fn(s.p)
        alpha = (s.rz / tree_vdot_real(s.p, q)).astype(dtype)
        x = tree_axpy(alpha, s.p, s.x)
        r_new = tree_axpy(-alpha, q, s.r)
        z_new = M_fn(r_new)
        rz_new = tree_vdot_real(r_new, z_new)
        # Polak-Ribière beta: <z_new, r_new - r> / <r, z>
        num = rz_new - tree_vdot_real(s.r, z_new)
        beta = (num / s.rz).astype(dtype)
        p = tree_axpy(beta, s.p, z_new)
        return _FCGState(x, r_new, z_new, p, rz_new, s.k + 1)

    init = _FCGState(x0, r0, z0, z0, rz0, jnp.array(0, jnp.int32))
    final = lax.while_loop(cond, body, init)

    res_norm = tree_norm(tree_sub(b, A_fn(final.x)))
    b_norm = jnp.sqrt(bs)
    thresh = jnp.maximum(tol * b_norm, atol) * _final_check_relax(
        _real_dtype(dtype))
    failed = (~jnp.isfinite(tree_norm(final.x))) \
        | (~jnp.isfinite(res_norm)) | (res_norm > thresh)
    info = jnp.where(failed, -1, 0).astype(jnp.int32)
    return final.x, info, final.k, res_norm


def fcg(A, b, x0: Optional[Any] = None, *, tol: float = 1e-5,
        atol: float = 0.0, maxiter: Optional[int] = None,
        M=None) -> Tuple[Any, jax.Array]:
    """Flexible CG; returns (x, info)."""
    x, info, _, _ = fcg_full(A, b, x0, tol=tol, atol=atol, maxiter=maxiter,
                             M=M)
    return x, info
