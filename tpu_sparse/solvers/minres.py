"""MINRES — minimum-residual solves for symmetric INDEFINITE systems.

Completes the symmetric solver family: CG requires positive definiteness
and GMRES pays O(restart) vectors of memory; MINRES (Paige & Saunders
1975) handles any symmetric/hermitian A — indefinite included (shifted
Laplacians, saddle-point KKT systems, Helmholtz) — with a three-term
Lanczos recurrence and Givens QR, so memory stays at a handful of
vectors and every iteration is one matvec like CG.

Neither the reference (Module A has cg/bicgstab/gmres only,
torch_sparse_linalg.py) nor jax.scipy ships MINRES; capability extension.
The structure is the classic Paige-Saunders recurrence (as in
scipy.sparse.linalg.minres) expressed as one jit-compiled lax.while_loop
over pytree operands, with the library's tolerance contract
(``converged iff ‖r‖ ≤ max(tol·‖b‖, atol)``, truthful recomputed final
residual) and the shared implicit-diff adjoint (A symmetric ⇒ the adjoint
solve reuses A).

The preconditioner M must be symmetric positive definite (it defines the
Lanczos inner product); the loop monitors the M-norm residual estimate
and the final check recomputes the true unpreconditioned residual.
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
    tree_scalar_mul,
    tree_sub,
    tree_vdot_real,
    tree_zeros_like,
)

Operator = Any


class _MinresState(NamedTuple):
    x: Any
    r1: Any
    r2: Any
    y: Any
    w: Any
    w2: Any
    oldb: jax.Array
    beta: jax.Array
    dbar: jax.Array
    epsln: jax.Array
    phibar: jax.Array
    cs: jax.Array
    sn: jax.Array
    k: jax.Array


def _minres_loop(A, M, b, x0, atol_norm, maxiter: int):
    dtype = _float_dtype(b)
    rdtype = _real_dtype(dtype)
    tiny = jnp.asarray(jnp.finfo(rdtype).tiny * 16, rdtype)

    def safe(v):
        return jnp.where(jnp.abs(v) > tiny, v, jnp.ones((), v.dtype))

    r1 = tree_sub(b, A(x0))
    y = M(r1)
    beta1 = jnp.sqrt(jnp.maximum(tree_vdot_real(r1, y), 0)).astype(rdtype)
    zero = jnp.zeros((), rdtype)

    init = _MinresState(
        x=x0, r1=r1, r2=r1, y=y, w=tree_zeros_like(b),
        w2=tree_zeros_like(b), oldb=zero, beta=beta1, dbar=zero,
        epsln=zero, phibar=beta1, cs=-jnp.ones((), rdtype), sn=zero,
        k=jnp.array(0, jnp.int32))

    def cond(s: _MinresState):
        return (s.k < maxiter) & (s.phibar > atol_norm) & (s.beta > tiny)

    def body(s: _MinresState):
        inv_beta = (1.0 / safe(s.beta)).astype(dtype)
        v = tree_scalar_mul(inv_beta, s.y)
        y = A(v)
        # three-term Lanczos: subtract the (beta/oldb) r1 term from the
        # second iteration on (oldb == 0 in the first)
        coef1 = jnp.where(s.k > 0, s.beta / safe(s.oldb), 0).astype(dtype)
        y = tree_axpy(-coef1, s.r1, y)
        alfa = tree_vdot_real(v, y).astype(rdtype)
        y = tree_axpy(-(alfa / safe(s.beta)).astype(dtype), s.r2, y)
        r1, r2 = s.r2, y
        y = M(r2)
        oldb = s.beta
        beta = jnp.sqrt(jnp.maximum(tree_vdot_real(r2, y), 0)).astype(
            rdtype)

        # Givens QR update of the Lanczos tridiagonal
        oldeps = s.epsln
        delta = s.cs * s.dbar + s.sn * alfa
        gbar = s.sn * s.dbar - s.cs * alfa
        epsln = s.sn * beta
        dbar = -s.cs * beta
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), tiny)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * s.phibar
        phibar = sn * s.phibar

        w1 = s.w2
        w2 = s.w
        w = tree_scalar_mul((1.0 / gamma).astype(dtype),
                            tree_axpy(-delta.astype(dtype), w2,
                                      tree_axpy(-oldeps.astype(dtype), w1,
                                                v)))
        x = tree_axpy(phi.astype(dtype), w, s.x)
        return _MinresState(x, r1, r2, y, w, w2, oldb, beta, dbar, epsln,
                            phibar, cs, sn, s.k + 1)

    fin = lax.while_loop(cond, body, init)
    return fin.x, fin.k


def minres_full(A: Operator, b: Any, x0: Optional[Any] = None, *,
                tol: float = 1e-5, atol: float = 0.0,
                maxiter: Optional[int] = None, M: Optional[Operator] = None
                ) -> Tuple[Any, jax.Array, jax.Array, jax.Array]:
    """MINRES returning (x, info, iterations, final_residual_norm)."""
    if x0 is None:
        x0 = tree_zeros_like(b)
    _check_tree_compat(x0, b)
    maxiter = _default_maxiter(b, maxiter)
    A_fn = as_matvec(A)
    M_fn = _identity if M is None else as_matvec(M)

    b_norm = tree_norm(b)
    atol_norm = jnp.maximum(tol * b_norm, atol)

    x, k = _minres_loop(A_fn, M_fn, b, x0, atol_norm, maxiter)

    res_norm = tree_norm(tree_sub(b, A_fn(x)))
    thresh = atol_norm * _final_check_relax(_real_dtype(_float_dtype(b)))
    failed = (~jnp.isfinite(tree_norm(x))) | (~jnp.isfinite(res_norm)) \
        | (res_norm > thresh)
    info = jnp.where(failed, -1, 0).astype(jnp.int32)
    return x, info, k, res_norm


def minres(A: Operator, b: Any, x0: Optional[Any] = None, *,
           tol: float = 1e-5, atol: float = 0.0,
           maxiter: Optional[int] = None, M: Optional[Operator] = None
           ) -> Tuple[Any, jax.Array]:
    """MINRES solve of symmetric (possibly indefinite) Ax = b.

    Returns ``(x, info)`` with info 0 on convergence, -1 otherwise.
    """
    x, info, _, _ = minres_full(A, b, x0, tol=tol, atol=atol,
                                maxiter=maxiter, M=M)
    return x, info


__all__ = ["minres", "minres_full"]
