"""Mixed-precision iterative refinement (defect correction).

TPU-native answer to the reference's fp64-everywhere policy
(torch_sparse_linalg.py:57-58): f64 is emulated on TPU (~10-40× slower than
the native f32 VPU path), so solving everything in f64 wastes the hardware.
Instead:

    x = 0  (f64)
    repeat:
        r  = b - A x                (f64 — one emulated SpMV per sweep)
        d  = solve(A₃₂, r₃₂)        (f32 Krylov solve, native speed)
        x += d
    until ‖r‖ ≤ max(tol·‖b‖, atol)

Each sweep multiplies the residual by roughly the inner tolerance, so two or
three f32 solves reach 1e-8 — the classic LAPACK-style refinement scheme,
here with Krylov inner solves. Runs as one jitted while_loop.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tpu_sparse.kernels import as_matvec
from tpu_sparse.solvers.krylov import (
    _default_maxiter,
    bicgstab_full,
    cg_full,
    gmres_full,
)
from tpu_sparse.sparse.containers import is_sparse
from tpu_sparse.utils.tree import (
    tree_add,
    tree_map,
    tree_norm,
    tree_size,
    tree_sub,
    tree_vdot_real,
    tree_zeros_like,
)


def _cast_tree(tree, dtype):
    return tree_map(lambda leaf: leaf.astype(dtype), tree)


def _cast_operator(A, dtype, outer_dtype=jnp.float64):
    if is_sparse(A):
        return A.with_data(A.data.astype(dtype))
    if callable(A) and not hasattr(A, "ndim"):
        # matrix-free: wrap with casts around the user's operator, which
        # expects operands in the OUTER system's dtype (not always f64)
        def op(x_inner):
            return _cast_tree(A(_cast_tree(x_inner, outer_dtype)), dtype)

        return op
    return A.astype(dtype)


def refined_solve(inner_solver: Callable, A, b, x0: Optional[Any] = None, *,
                  tol: float = 1e-8, atol: float = 0.0,
                  inner_tol: float = 1e-5,
                  maxiter: Optional[int] = None,
                  max_sweeps: int = 6, M=None,
                  inner_dtype=jnp.float32,
                  inner_maxiter: Optional[int] = None,
                  rescue_maxiter: Optional[int] = None,
                  **inner_kwargs):
    """Defect-correction refinement around an f32 inner Krylov solve.

    The sweep loop is a static Python unroll rather than a while_loop:
    nesting the inner solver's while_loop (which may contain a Pallas
    kernel) inside an outer while_loop trips an infinite recursion in
    tracing, and the unroll also lets converged sweeps short-circuit —
    a converged sweep feeds the inner solver an all-zero rhs, whose
    residual check exits at iteration 0.

    `inner_maxiter` / `rescue_maxiter` cap the per-sweep / rescue inner
    solve independently of `maxiter` — essential for restarted methods
    whose `maxiter` counts restart cycles (a stalled f32 GMRES sweep
    would otherwise burn `maxiter` full cycles before the accept logic
    rejects it).

    Returns (x, info, total_inner_iterations, residual_norm) in b's dtype.
    """
    A_fn = as_matvec(A)
    outer_dtype = _first_dtype(b)
    A_rescue = A
    df_op = _make_df_operator(A, outer_dtype)
    if df_op is not None:
        # f64 DIA on TPU: outer residuals and the rescue sweep run the
        # double-f32 compensated Pallas SpMV (~3.8× the XLA-emulated f64
        # path, ~2^-45 accuracy — pallas_spmv.ExtendedStencilOperatorDF).
        A_fn = df_op.matvec64
        A_rescue = df_op.matvec64
    A32 = _cast_operator(A, inner_dtype, outer_dtype)
    M32 = None
    if M is not None:
        if is_sparse(M):
            M32 = _cast_operator(M, inner_dtype)
        else:
            # Partial/pytree preconditioners: cast float leaves so the
            # inner solve stays in inner_dtype (f64 leaves would silently
            # upcast every inner iteration).
            M32 = tree_map(
                lambda leaf: leaf.astype(inner_dtype)
                if hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating) else leaf,
                M)
    maxiter = _default_maxiter(b, maxiter)
    if inner_maxiter is None:
        inner_maxiter = maxiter
    if rescue_maxiter is None:
        rescue_maxiter = maxiter

    b_norm = tree_norm(b)
    thresh = jnp.maximum(tol * b_norm, atol)
    out_dtype = _first_dtype(b)

    _inner = _make_inner(inner_solver, A32, M32, inner_tol, inner_maxiter,
                         inner_kwargs)

    x = tree_zeros_like(b) if x0 is None else x0
    res_norm = tree_norm(tree_sub(b, A_fn(x)))
    inner_iters = jnp.array(0, jnp.int32)
    stalled = jnp.array(False)

    for _ in range(max_sweeps):
        done = (res_norm <= thresh) | (~jnp.isfinite(res_norm)) | stalled
        r = tree_sub(b, A_fn(x))
        rhs32 = _cast_tree(
            tree_map(lambda leaf: jnp.where(done, 0.0, leaf), r),
            inner_dtype)
        d32, _, it, _ = _inner(rhs32)
        # Accept the sweep only if it actually reduced the true residual
        # (an inner f32 breakdown can return a finite but useless update);
        # a rejected sweep marks the solve stalled and stops refining.
        d = _cast_tree(d32, out_dtype)
        x_new = tree_add(x, d)
        res_new = tree_norm(tree_sub(b, A_fn(x_new)))
        accept = jnp.isfinite(res_new) & (res_new < res_norm) & ~done
        x = tree_map(lambda a, bnew: jnp.where(accept, bnew, a), x, x_new)
        res_norm = jnp.where(accept, res_new, res_norm)
        stalled = stalled | (~accept & ~done)
        # breakdown info codes are negative; don't sum them into the count
        inner_iters = inner_iters + jnp.maximum(it, 0)

    # Full-precision rescue sweep: ill-conditioned systems can defeat the
    # f32 inner solves (the sweeps stall above tol). Run one inner solve in
    # the OUTER dtype on the current defect, targeting the true threshold
    # directly (tol=0, atol=thresh). The zero-rhs trick keeps it free when
    # the f32 sweeps already converged: its residual check exits at
    # iteration 0.
    failed = (~jnp.isfinite(res_norm)) | (res_norm > thresh)
    r = tree_sub(b, A_fn(x))
    rhs = tree_map(
        lambda leaf: jnp.where(failed, leaf, jnp.zeros_like(leaf)), r)
    d, _, it_f, _ = inner_solver(A_rescue, rhs, None, tol=0.0, atol=thresh,
                                 maxiter=rescue_maxiter, M=M, **inner_kwargs)
    x_new = tree_add(x, d)
    res_new = tree_norm(tree_sub(b, A_fn(x_new)))
    accept = jnp.isfinite(res_new) & (res_new < res_norm) & failed
    x = tree_map(lambda a, bnew: jnp.where(accept, bnew, a), x, x_new)
    res_norm = jnp.where(accept, res_new, res_norm)
    inner_iters = inner_iters + jnp.maximum(it_f, 0)

    failed = (~jnp.isfinite(res_norm)) | (res_norm > thresh)
    info = jnp.where(failed, -1, 0).astype(jnp.int32)
    return x, info, inner_iters, res_norm


def _first_dtype(tree):
    return jax.tree_util.tree_leaves(tree)[0].dtype


def _make_df_operator(A, outer_dtype):
    """Double-f32 extended operator for the f64 outer system, or None."""
    from tpu_sparse import kernels as _kernels
    from tpu_sparse.sparse.containers import DIA

    if not (isinstance(A, DIA)
            and _kernels._PALLAS_ENABLED
            and jax.default_backend() == "tpu"
            and outer_dtype == jnp.float64
            and A.data.dtype == jnp.float64):
        return None
    from tpu_sparse.kernels.pallas_spmv import make_extended_operator_f64

    return make_extended_operator_f64(A)


def _make_inner(inner_solver, A32, M32, inner_tol, maxiter, inner_kwargs):
    """Build the per-sweep inner solve closure. On TPU, f32 DIA systems
    (with no/diagonal preconditioner) run through the halo-extended Pallas
    operator so every inner iteration uses the pad-free SpMV fast path
    (round-1 gap: mixed-precision inner solves ran the pad-per-call
    kernel)."""
    from tpu_sparse import kernels as _kernels
    from tpu_sparse.sparse.containers import DIA

    def _diag_partial(M):
        from jax.tree_util import Partial

        from tpu_sparse.precond.jacobi import _apply_diag

        return M is None or (isinstance(M, Partial)
                             and M.func is _apply_diag)

    use_ext = (
        isinstance(A32, DIA)
        and _kernels._PALLAS_ENABLED
        and jax.default_backend() == "tpu"
        and A32.data.dtype in (jnp.float32, jnp.bfloat16)
        and A32.shape[0] == A32.shape[1]
        and bool(A32.offsets)
        and max(abs(o) for o in A32.offsets) < A32.shape[0]
        and _diag_partial(M32)
    )
    if use_ext:
        from jax.tree_util import Partial

        from tpu_sparse.kernels.pallas_spmv import ExtendedStencilOperator
        from tpu_sparse.precond.jacobi import _apply_diag

        op32 = ExtendedStencilOperator(A32)
        M32e = None if M32 is None else Partial(
            _apply_diag, op32.extend_diag(M32.args[0]))

        def _inner(rhs):
            out = inner_solver(op32, op32.extend(rhs), None, tol=inner_tol,
                               maxiter=maxiter, M=M32e, **inner_kwargs)
            return (op32.extract(out[0]),) + tuple(out[1:])

        return _inner

    def _inner(rhs):
        return inner_solver(A32, rhs, None, tol=inner_tol, maxiter=maxiter,
                            M=M32, **inner_kwargs)

    return _inner


def cg_refined(A, b, x0=None, *, tol: float = 1e-8, atol: float = 0.0,
               inner_tol: float = 1e-5, maxiter: Optional[int] = None,
               max_sweeps: int = 8, M=None):
    """f64-accurate CG at f32 speed via defect correction."""
    return refined_solve(cg_full, A, b, x0, tol=tol, atol=atol,
                         inner_tol=inner_tol, maxiter=maxiter,
                         max_sweeps=max_sweeps, M=M)


def bicgstab_refined(A, b, x0=None, *, tol: float = 1e-8, atol: float = 0.0,
                     inner_tol: float = 1e-5, maxiter: Optional[int] = None,
                     max_sweeps: int = 8, M=None):
    return refined_solve(bicgstab_full, A, b, x0, tol=tol, atol=atol,
                         inner_tol=inner_tol, maxiter=maxiter,
                         max_sweeps=max_sweeps, M=M)


# Systems at or below this size run FULL GMRES (restart = n) under the
# adaptive-restart policy: the Krylov buffer is at most ~8 MB in f64 and
# exact termination in <= n iterations beats thousands of small restart
# cycles by orders of magnitude on ill-conditioned systems.
_ADAPTIVE_FULL_GMRES_N = 1024


def gmres_refined(A, b, x0=None, *, tol: float = 1e-8, atol: float = 0.0,
                  inner_tol: float = 1e-5, restart: int = 20,
                  maxiter: Optional[int] = None, max_sweeps: int = 8,
                  M=None, solve_method: str = "batched",
                  adaptive_restart: bool = True):
    """Mixed-precision GMRES via defect correction.

    ``adaptive_restart`` (default on) treats ``restart`` as a hint: for
    small systems (n <= 1024) the effective restart is raised to n —
    full GMRES, which terminates in at most n Arnoldi steps. Restarted
    GMRES(m) with m << sqrt(cond(A)) converges arbitrarily slowly on SPD
    systems (the round-2 headline pathology: GMRES(20) on the n=500 1-D
    Laplacian, cond ~ 1e5, needed thousands of f64 restart cycles), while
    one full cycle is ~n vectorized Arnoldi steps. Pass
    ``adaptive_restart=False`` for strict reference semantics
    (torch_sparse_linalg.py:641-784 keeps restart fixed).

    When the effective restart reaches n, each f32 sweep and the f64
    rescue are capped at a handful of cycles — exact termination makes
    further cycles pure waste for a stalled inner solve.
    """
    n = tree_size(b)
    inner_cap = None
    rescue_cap = None
    if adaptive_restart and restart < n and n <= _ADAPTIVE_FULL_GMRES_N:
        restart = n
    if restart >= n:
        # full GMRES: one cycle suffices in exact arithmetic — a stalled
        # f32 sweep gains nothing from a second cycle (its floor is set
        # by the f32 lstsq, not by Krylov depth), so sweeps run exactly
        # one cycle and the accept logic judges the result
        inner_cap = 1
        rescue_cap = 4
    return refined_solve(gmres_full, A, b, x0, tol=tol, atol=atol,
                         inner_tol=inner_tol, maxiter=maxiter,
                         max_sweeps=max_sweeps, M=M, restart=restart,
                         solve_method=solve_method,
                         inner_maxiter=inner_cap,
                         rescue_maxiter=rescue_cap)


def cg_sr_refined(A, b, x0=None, *, tol: float = 1e-8, atol: float = 0.0,
                  inner_tol: float = 1e-5, maxiter: Optional[int] = None,
                  max_sweeps: int = 8, M=None):
    """Defect correction around the single-reduction (Chronopoulos-Gear)
    CG — mixed precision without giving up the fused all-reduce round."""
    from tpu_sparse.solvers.pipelined import cg_sr_full

    return refined_solve(cg_sr_full, A, b, x0, tol=tol, atol=atol,
                         inner_tol=inner_tol, maxiter=maxiter,
                         max_sweeps=max_sweeps, M=M)


def minres_refined(A, b, x0=None, *, tol: float = 1e-8, atol: float = 0.0,
                   inner_tol: float = 1e-5, maxiter: Optional[int] = None,
                   max_sweeps: int = 8, M=None):
    """Defect correction around MINRES: symmetric INDEFINITE systems at
    f32 speed (each sweep only needs the inner solve to reduce the true
    residual, which MINRES does monotonically)."""
    from tpu_sparse.solvers.minres import minres_full

    return refined_solve(minres_full, A, b, x0, tol=tol, atol=atol,
                         inner_tol=inner_tol, maxiter=maxiter,
                         max_sweeps=max_sweeps, M=M)


def fcg_refined(A, b, x0=None, *, tol: float = 1e-8, atol: float = 0.0,
                inner_tol: float = 1e-5, maxiter: Optional[int] = None,
                max_sweeps: int = 8, M=None):
    """Defect correction around flexible CG (variable preconditioners).
    A callable M is applied to f32 operands inside the sweeps — supply an
    f32-safe preconditioner (Partial/pytree preconditioners are cast
    automatically)."""
    from tpu_sparse.solvers.fcg import fcg_full

    return refined_solve(fcg_full, A, b, x0, tol=tol, atol=atol,
                         inner_tol=inner_tol, maxiter=maxiter,
                         max_sweeps=max_sweeps, M=M)


def fgmres_refined(A, b, x0=None, *, tol: float = 1e-8, atol: float = 0.0,
                   inner_tol: float = 1e-5, restart: int = 20,
                   maxiter: Optional[int] = None, max_sweeps: int = 8,
                   M=None):
    """Defect correction around FGMRES (see fcg_refined on callable M)."""
    from tpu_sparse.solvers.fgmres import fgmres_full

    return refined_solve(fgmres_full, A, b, x0, tol=tol, atol=atol,
                         inner_tol=inner_tol, maxiter=maxiter,
                         max_sweeps=max_sweeps, M=M, restart=restart)
