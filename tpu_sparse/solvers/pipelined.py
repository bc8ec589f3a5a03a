"""Single-reduction CG (Chronopoulos–Gear recurrence).

Classic CG performs two *dependent* global reductions per iteration
(``<p, Ap>`` after the matvec, then ``<r, z>`` after the update); on a
row-partitioned mesh each reduction is an all-reduce, and across hosts
(DCN) each costs a full network round trip. The Chronopoulos–Gear form
[Chronopoulos & Gear, J. Comput. Appl. Math. 25 (1989); PETSc's
``-ksp_cg_single_reduction``] reorders the recurrences so the three dot
products of an iteration (``<r,u>``, ``<w,u>``, ``<r,r>``) are mutually
independent and can be fused into ONE all-reduce round:

    u = M r ;  w = A u
    gamma' = <r,u> ;  delta = <w,u>          (one fused reduction round)
    beta  = gamma'/gamma
    alpha = gamma' / (delta - beta*gamma'/alpha)
    p = u + beta p ;  s = w + beta s         (s tracks A p)
    x += alpha p ;  r -= alpha s

The trade: one extra vector recurrence (s) and 1–2 extra axpys per
iteration, and a recurrence that is mildly less robust in finite
precision than classic CG — the standard result is a ~sqrt(eps) earlier
stagnation floor, irrelevant at the 1e-6..1e-8 tolerances this library
targets and fully caught by the final unpreconditioned true-residual
check (same contract as ``cg_full``).

No reference counterpart (the reference is single-device,
SURVEY.md §2.3); this serves the north-star distributed obligation where
reduction latency, not bandwidth, bounds strong scaling. Under jit the
three dots lower to independent all-reduces that XLA's all-reduce
combiner merges into one fused collective.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tpu_sparse.kernels import as_matvec
from tpu_sparse.solvers.krylov import (Operator, _check_tree_compat,
                                       _default_maxiter, _final_check_relax,
                                       _float_dtype, _identity, _real_dtype)
from tpu_sparse.utils.tree import (tree_axpy, tree_norm, tree_sub,
                                   tree_vdot_real, tree_zeros_like)


class _SRCGState(NamedTuple):
    x: Any
    r: Any
    p: Any
    s: Any        # s = A p, maintained by recurrence
    gamma: jax.Array
    alpha: jax.Array
    rr: jax.Array
    k: jax.Array


def _cg_sr_loop(A: Callable, M: Callable, b, x0, atol2, maxiter: int,
                precond_is_identity: bool):
    r0 = tree_sub(b, A(x0))
    u0 = M(r0)
    w0 = A(u0)
    dtype = _float_dtype(u0)
    rdtype = _real_dtype(dtype)
    gamma0 = tree_vdot_real(r0, u0).astype(rdtype)
    delta0 = tree_vdot_real(w0, u0).astype(rdtype)
    rr0 = gamma0 if precond_is_identity \
        else tree_vdot_real(r0, r0).astype(rdtype)
    # guard the first alpha against a zero/indefinite start (r0 = 0)
    alpha0 = jnp.where(delta0 > 0, gamma0 / jnp.where(delta0 > 0, delta0,
                                                      jnp.ones((), rdtype)),
                       jnp.zeros((), rdtype))

    def cond(st: _SRCGState):
        return (st.k < maxiter) & (st.rr > atol2)

    def body(st: _SRCGState):
        x = tree_axpy(st.alpha.astype(dtype), st.p, st.x)
        r = tree_axpy(-st.alpha.astype(dtype), st.s, st.r)
        u = M(r)
        w = A(u)
        # the three dots below are mutually independent: one fused
        # all-reduce round on a mesh (vs 2 dependent rounds in cg_full)
        gamma_new = tree_vdot_real(r, u).astype(rdtype)
        delta = tree_vdot_real(w, u).astype(rdtype)
        rr = gamma_new if precond_is_identity \
            else tree_vdot_real(r, r).astype(rdtype)
        beta = gamma_new / st.gamma
        denom = delta - beta * gamma_new / st.alpha
        # denom = <p,Ap> > 0 for SPD operands in exact arithmetic; near
        # stagnation rounding can push it <= 0 — stall (alpha = 0) rather
        # than diverge, and let the final true-residual check report -1
        alpha = jnp.where(denom > 0,
                          gamma_new / jnp.where(denom > 0, denom,
                                                jnp.ones((), rdtype)),
                          jnp.zeros((), rdtype))
        p = tree_axpy(beta.astype(dtype), st.p, u)
        s = tree_axpy(beta.astype(dtype), st.s, w)
        return _SRCGState(x, r, p, s, gamma_new, alpha, rr, st.k + 1)

    init = _SRCGState(x0, r0, u0, w0, gamma0, alpha0, rr0,
                      jnp.array(0, jnp.int32))
    # Each body applies the PREVIOUS alpha (alpha_k lives one state ahead
    # of x_k, computed in init for k=0), so on exit final.x is exactly the
    # iterate whose rr passed the stopping rule — no trailing update
    # (maxiter=0 returns x0 unchanged, matching cg_full).
    final = lax.while_loop(cond, body, init)
    return final.x, final.k


def cg_sr_full(A: Operator, b: Any, x0: Optional[Any] = None, *,
               tol: float = 1e-5, atol: float = 0.0,
               maxiter: Optional[int] = None,
               M: Optional[Operator] = None):
    """Single-reduction CG returning (x, info, iterations, residual).

    Same call/tolerance/info contract as ``cg_full``
    (``|r| <= max(tol*|b|, atol)``, info 0/-1); see module docstring for
    when to prefer it (reduction-latency-bound distributed solves).
    """
    if x0 is None:
        x0 = tree_zeros_like(b)
    _check_tree_compat(x0, b)
    maxiter = _default_maxiter(b, maxiter)
    A_fn = as_matvec(A)
    precond_identity = M is None
    M_fn = _identity if M is None else as_matvec(M)

    bs = tree_vdot_real(b, b)
    atol2 = jnp.maximum(jnp.square(tol) * bs, jnp.square(atol))

    x, k = _cg_sr_loop(A_fn, M_fn, b, x0, atol2, maxiter, precond_identity)

    res_norm = tree_norm(tree_sub(b, A_fn(x)))
    b_norm = jnp.sqrt(bs)
    thresh = jnp.maximum(tol * b_norm, atol) * _final_check_relax(
        _real_dtype(_float_dtype(b)))
    failed = (~jnp.isfinite(tree_norm(x))) | (~jnp.isfinite(res_norm)) \
        | (res_norm > thresh)
    info = jnp.where(failed, -1, 0).astype(jnp.int32)
    return x, info, k, res_norm


def cg_sr(A: Operator, b: Any, x0: Optional[Any] = None, *,
          tol: float = 1e-5, atol: float = 0.0,
          maxiter: Optional[int] = None,
          M: Optional[Operator] = None) -> Tuple[Any, jax.Array]:
    """Single-reduction CG; returns ``(x, info)`` like ``cg``."""
    x, info, _, _ = cg_sr_full(A, b, x0, tol=tol, atol=atol,
                               maxiter=maxiter, M=M)
    return x, info
