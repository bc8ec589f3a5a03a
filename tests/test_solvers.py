"""Krylov solver correctness — mirrors reference test_module_a.py:
CG on SPD tridiagonal (:93-124), BiCGStab on nonsymmetric (:126-161),
GMRES with restart (:163-195), matrix-free operators (:197-232),
CG on 2-D Poisson (:234-271), batched/incremental GMRES parity (:273-315).
Tolerance tiers follow SURVEY.md §4: iterative rel-residual < 1e-6."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sparse.solvers import bicgstab, bicgstab_full, cg, cg_full, gmres, gmres_full
from tpu_sparse.sparse import generators
from tpu_sparse.sparse.convert import to_csr


def rel_residual(A, x, b):
    Ax = A @ x if not callable(A) else A(x)
    return float(jnp.linalg.norm(b - Ax) / jnp.linalg.norm(b))


def make_b(A, seed=0):
    n = A.shape[0]
    x_true = jnp.asarray(np.random.default_rng(seed).standard_normal(n))
    return A @ x_true, x_true


class TestCG:
    def test_tridiagonal_spd(self):
        A = generators.tridiagonal(64)
        b, x_true = make_b(A)
        x, info = cg(A, b, tol=1e-10)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   rtol=1e-5, atol=1e-6)

    def test_poisson2d(self):
        A = generators.poisson2d(8)  # 64 dof, matches tridiag size for cache
        b, _ = make_b(A)
        x, info, iters, res = cg_full(A, b, tol=1e-8)
        assert int(info) == 0
        assert int(iters) > 0
        assert rel_residual(A, x, b) < 1e-6

    def test_matrix_free(self):
        A = generators.tridiagonal(64)

        def op(v):
            return A @ v

        b, _ = make_b(A)
        x, info = cg(op, b, tol=1e-10)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6

    def test_csr_operand(self):
        A = generators.tridiagonal(64)
        Acsr = to_csr(A)
        b, _ = make_b(A)
        x, info = cg(Acsr, b, tol=1e-10)
        assert int(info) == 0
        assert rel_residual(Acsr, x, b) < 1e-6

    def test_pytree_operands(self):
        """Solve a block-diagonal system expressed as a 2-leaf pytree."""
        A1 = generators.tridiagonal(64)
        A2 = generators.poisson2d(8)

        def op(v):
            return {"a": A1 @ v["a"], "p": A2 @ v["p"]}

        rng = np.random.default_rng(1)
        xt = {"a": jnp.asarray(rng.standard_normal(64)),
              "p": jnp.asarray(rng.standard_normal(64))}
        b = op(xt)
        x, info = cg(op, b, tol=1e-10)
        assert int(info) == 0
        np.testing.assert_allclose(np.asarray(x["a"]), np.asarray(xt["a"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x["p"]), np.asarray(xt["p"]),
                                   rtol=1e-5, atol=1e-6)

    def test_maxiter_nonconvergence(self):
        A = generators.poisson2d(8)
        b, _ = make_b(A)
        x, info = cg(A, b, tol=1e-12, maxiter=2)
        assert int(info) == -1

    def test_jit(self):
        A = generators.tridiagonal(64)
        b, _ = make_b(A)
        f = jax.jit(lambda a, rhs: cg(a, rhs, tol=1e-10)[0])
        x = f(A, b)
        assert rel_residual(A, x, b) < 1e-6


class TestBiCGStab:
    def test_nonsymmetric(self):
        A = generators.convection_diffusion(64)
        b, _ = make_b(A)
        x, info = bicgstab(A, b, tol=1e-10)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6

    def test_preconditioned(self):
        A = generators.convection_diffusion(64)
        b, _ = make_b(A)
        diag = A.data[1]  # DIA main diagonal
        M = jax.tree_util.Partial(lambda d, v: v / d, diag)
        x, info = bicgstab(A, b, tol=1e-10, M=M)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6

    def test_convection_diffusion_3d_27pt(self):
        """The at-scale nonsymmetric bench system (bicgstab_110M row),
        checked small: genuinely nonsymmetric, solvable by BiCGStab to
        the iterative tier, and CG-hostile asymmetry is in the ±x
        couplings only."""
        A = generators.convection_diffusion_3d_27pt(8, beta=0.3)
        D = np.asarray(A.todense())
        assert not np.allclose(D, D.T)
        offs = list(A.offsets)
        np.testing.assert_allclose(
            np.asarray(A.data)[offs.index(-1)].min(), -1.3)
        b, _ = make_b(A)
        x, info = bicgstab(A, b, tol=1e-10)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6


class TestGMRES:
    def test_nonsymmetric_batched(self):
        A = generators.convection_diffusion(64)
        b, _ = make_b(A)
        x, info = gmres(A, b, tol=1e-10, restart=30)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6

    def test_incremental(self):
        A = generators.convection_diffusion(64)
        b, _ = make_b(A)
        x, info = gmres(A, b, tol=1e-10, restart=30,
                        solve_method="incremental")
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6

    def test_batched_incremental_parity(self):
        """Reference test_module_a.py:273-315."""
        A = generators.convection_diffusion(64)
        b, _ = make_b(A, seed=3)
        xb, ib = gmres(A, b, tol=1e-10, restart=30, solve_method="batched")
        xi, ii = gmres(A, b, tol=1e-10, restart=30,
                       solve_method="incremental")
        assert int(ib) == 0 and int(ii) == 0
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xi),
                                   rtol=1e-6, atol=1e-8)

    def test_spd(self):
        A = generators.tridiagonal(64)
        b, _ = make_b(A)
        x, info = gmres(A, b, tol=1e-10, restart=30)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6


class TestFCG:
    def test_fcg_with_nonsymmetric_preconditioner(self):
        """FCG converges where plain CG stalls: AMG V(0,3) is a
        nonsymmetric preconditioner."""
        from tpu_sparse.precond import amg_preconditioner
        from tpu_sparse.solvers import fcg_full

        A = generators.tridiagonal(200)
        b, _ = make_b(A)
        M = amg_preconditioner(A, pre_sweeps=0, post_sweeps=3)
        x, info, iters, res = fcg_full(A, b, tol=1e-8, M=M, maxiter=200)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6

    def test_fcg_matches_cg_unpreconditioned(self):
        from tpu_sparse.solvers import fcg

        A = generators.tridiagonal(64)
        b, x_true = make_b(A)
        x, info = fcg(A, b, tol=1e-10)
        assert int(info) == 0
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   rtol=1e-6, atol=1e-8)


class TestFGMRES:
    def test_fgmres_with_variable_preconditioner(self):
        """FGMRES with a nonsymmetric AMG V(0,3) cycle (what left-GMRES
        assumes fixed and FCG needs SPD for)."""
        from tpu_sparse.precond import amg_preconditioner
        from tpu_sparse.solvers import fgmres_full

        A = generators.convection_diffusion(200)
        b, _ = make_b(A)
        M = amg_preconditioner(A, pre_sweeps=0, post_sweeps=3)
        x, info, cycles, res = fgmres_full(A, b, tol=1e-8, M=M, restart=30)
        assert int(info) == 0
        assert rel_residual(A, x, b) < 1e-6

    def test_fgmres_matches_gmres_unpreconditioned(self):
        from tpu_sparse.solvers import fgmres

        A = generators.convection_diffusion(64)
        b, x_true = make_b(A)
        x, info = fgmres(A, b, tol=1e-10, restart=30)
        assert int(info) == 0
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   rtol=1e-6, atol=1e-8)

    def test_fgmres_jit(self):
        from tpu_sparse.solvers import fgmres

        A = generators.tridiagonal(64)
        b, _ = make_b(A)
        x, info = jax.jit(lambda a, r: fgmres(a, r, tol=1e-10))(A, b)
        assert int(info) == 0


# ---------------------------------------------------------------------------
# Block CG (multi-RHS, shared Krylov space)
# ---------------------------------------------------------------------------


def test_block_cg_multi_rhs():
    from tpu_sparse.solvers import block_cg
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(20)
    Xt = jnp.asarray(rng.standard_normal((n, 4)))
    B = jnp.stack([A @ Xt[:, j] for j in range(4)], axis=1)
    X, infos, iters, res = block_cg(A, B, tol=1e-8)
    assert np.all(np.asarray(infos) == 0), np.asarray(res)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xt),
                               rtol=1e-5, atol=1e-7)
    # shared-space advantage: block iterations <= single-RHS CG iterations
    from tpu_sparse.solvers import cg_full

    _, _, it1, _ = cg_full(A, B[:, 0], tol=1e-8)
    assert int(iters) <= int(it1) + 1


def test_block_cg_early_column_freeze():
    """A column whose x0 is already the solution must freeze (the classic
    block-CG rank-deficiency breakdown) and not poison the others."""
    from tpu_sparse.solvers import block_cg
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(10)
    n = A.shape[0]
    rng = np.random.default_rng(21)
    Xt = jnp.asarray(rng.standard_normal((n, 3)))
    B = jnp.stack([A @ Xt[:, j] for j in range(3)], axis=1)
    X0 = jnp.zeros_like(B).at[:, 1].set(Xt[:, 1])  # column 1 pre-solved
    X, infos, _, res = block_cg(A, B, X0, tol=1e-8)
    assert np.all(np.asarray(infos) == 0), np.asarray(res)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xt),
                               rtol=1e-5, atol=1e-7)


def test_block_cg_preconditioned_jit():
    from tpu_sparse.precond import jacobi_preconditioner
    from tpu_sparse.solvers import block_cg
    from tpu_sparse.sparse import generators

    A = generators.poisson3d_27pt(6)
    n = A.shape[0]
    rng = np.random.default_rng(22)
    B = jnp.asarray(rng.standard_normal((n, 5)))
    M = jacobi_preconditioner(A)
    f = jax.jit(lambda a, bb: block_cg(a, bb, tol=1e-7, M=M))
    X, infos, iters, res = f(A, B)
    assert np.all(np.asarray(infos) == 0)
    rel = np.linalg.norm(np.asarray(B) - np.asarray(
        jnp.stack([A @ X[:, j] for j in range(5)], axis=1)), axis=0)
    assert np.all(rel <= 1e-7 * np.linalg.norm(np.asarray(B), axis=0) * 10)


def test_block_cg_f32():
    from tpu_sparse.solvers import block_cg
    from tpu_sparse.sparse import generators

    A = generators.tridiagonal(200, dtype=np.float32)
    rng = np.random.default_rng(23)
    B = jnp.asarray(rng.standard_normal((200, 2)).astype(np.float32))
    X, infos, _, res = block_cg(A, B, tol=1e-5)
    assert X.dtype == jnp.float32
    assert np.all(np.asarray(infos) == 0)


# ---------------------------------------------------------------------------
# MINRES (symmetric indefinite)
# ---------------------------------------------------------------------------


def _indefinite_system(n=144, shift=1.5, seed=50):
    """Shifted 2-D Laplacian A - shift*I: symmetric, indefinite for
    shift inside the spectrum. Returned dense + as a DIA container."""
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(int(np.sqrt(n)))
    d0 = A.offsets.index(0)
    data = A.data.at[d0].add(-shift)
    from tpu_sparse.sparse.containers import DIA

    return DIA(data, A.offsets, A.shape)


def test_minres_spd_matches_cg():
    from tpu_sparse.solvers import cg_full, minres_full
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(10)
    rng = np.random.default_rng(51)
    b = jnp.asarray(rng.standard_normal(100))
    x_m, info_m, it_m, _ = minres_full(A, b, tol=1e-10)
    x_c, info_c, _, _ = cg_full(A, b, tol=1e-10)
    assert int(info_m) == 0 and int(info_c) == 0
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_c),
                               rtol=1e-7, atol=1e-9)


def test_minres_indefinite():
    """CG fails / is unreliable on indefinite A; MINRES must converge."""
    from tpu_sparse.solvers import minres_full

    A = _indefinite_system()
    # verify indefiniteness
    eig = np.linalg.eigvalsh(np.asarray(A.todense()))
    assert eig.min() < 0 < eig.max()
    rng = np.random.default_rng(52)
    x_true = jnp.asarray(rng.standard_normal(A.shape[0]))
    b = A @ x_true
    x, info, iters, res = minres_full(A, b, tol=1e-9, maxiter=3000)
    assert int(info) == 0, float(res)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-5, atol=1e-6)


def test_minres_scipy_parity():
    import scipy.sparse.linalg as spl

    from tpu_sparse.solvers import minres_full

    A = _indefinite_system(n=100, shift=0.9)
    Ad = np.asarray(A.todense())
    rng = np.random.default_rng(53)
    b = rng.standard_normal(100)
    x, info, _, _ = minres_full(A, jnp.asarray(b), tol=1e-10, maxiter=2000)
    x_sp, sp_info = spl.minres(Ad, b, rtol=1e-10, maxiter=2000)
    assert int(info) == 0 and sp_info == 0
    np.testing.assert_allclose(np.asarray(x), x_sp, rtol=1e-6, atol=1e-7)


def test_minres_jit_and_preconditioned():
    from tpu_sparse.precond import jacobi_preconditioner
    from tpu_sparse.solvers import minres_full
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(12)  # SPD; Jacobi M is SPD as required
    rng = np.random.default_rng(54)
    b = jnp.asarray(rng.standard_normal(144))
    M = jacobi_preconditioner(A)
    f = jax.jit(lambda a, rhs: minres_full(a, rhs, tol=1e-9, M=M))
    x, info, iters, res = f(A, b)
    assert int(info) == 0
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-8


def test_minres_grad_fd():
    """Implicit-diff adjoint through MINRES, checked by finite differences."""
    from tpu_sparse.autodiff import minres_diff

    A = _indefinite_system(n=64, shift=1.2, seed=55)
    rng = np.random.default_rng(55)
    b = jnp.asarray(rng.standard_normal(64))

    def loss(bb):
        x, info, _, _ = minres_diff(A, bb, tol=1e-12, maxiter=2000)
        return jnp.sum(x ** 2)

    g = jax.grad(loss)(b)
    e = jnp.zeros_like(b).at[7].set(1.0)
    h = 1e-6
    fd = (loss(b + h * e) - loss(b - h * e)) / (2 * h)
    np.testing.assert_allclose(float(g[7]), float(fd), rtol=1e-4)


def test_minres_router_and_failure():
    from tpu_sparse.api.solver import SparseSolver
    from tpu_sparse.sparse import generators

    s = SparseSolver()
    A = _indefinite_system(n=100, shift=0.7)
    rng = np.random.default_rng(56)
    b = jnp.asarray(rng.standard_normal(100))
    x, r = s.solve(A, b, method="minres", tol=1e-8)
    assert r.converged and r.method == "minres"
    # truthful failure on maxiter exhaustion
    x2, r2 = s.solve(A, b, method="minres", tol=1e-14, maxiter=3)
    assert not r2.converged


# ---------------------------------------------------------------------------
# Single-reduction (Chronopoulos-Gear) CG — solvers/pipelined.py
# ---------------------------------------------------------------------------


def test_cg_sr_matches_cg():
    """cg_sr must converge to the same solution in a comparable number of
    iterations (the recurrence is mathematically identical CG)."""
    from tpu_sparse.solvers import cg_full, cg_sr_full
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(24)
    n = A.shape[0]
    rng = np.random.default_rng(31)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    x1, i1, k1, r1 = cg_full(A, b, tol=1e-10)
    x2, i2, k2, r2 = cg_sr_full(A, b, tol=1e-10)
    assert int(i1) == 0 and int(i2) == 0
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_true),
                               rtol=1e-7, atol=1e-7)
    # finite-precision CG-CG may need a handful more iterations
    assert int(k2) <= int(k1) + 10, (int(k1), int(k2))


def test_cg_sr_preconditioned():
    from tpu_sparse.precond import jacobi_preconditioner
    from tpu_sparse.solvers import cg_sr_full
    from tpu_sparse.sparse import generators

    A = generators.tridiagonal(400, dtype=np.float64)
    n = A.shape[0]
    rng = np.random.default_rng(32)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    x, info, k, res = cg_sr_full(A, b, tol=1e-10,
                                 M=jacobi_preconditioner(A))
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-7, atol=1e-7)


def test_cg_sr_honest_failure():
    """Indefinite system: must report info=-1, not a wrong answer."""
    from tpu_sparse.solvers import cg_sr_full

    n = 64
    rng = np.random.default_rng(33)
    d = jnp.asarray(np.r_[np.ones(32), -np.ones(32)])
    A = lambda v: d * v  # noqa: E731
    b = jnp.asarray(rng.standard_normal(n))
    x, info, k, res = cg_sr_full(A, b, tol=1e-12, maxiter=100)
    assert int(info) in (-1, 0)
    if int(info) == 0:  # if it claims success the residual must be real
        assert float(res) <= 1e-10 * float(jnp.linalg.norm(b))


def test_cg_sr_zero_rhs():
    from tpu_sparse.solvers import cg_sr_full
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(8)
    b = jnp.zeros(64, dtype=A.dtype)
    x, info, k, res = cg_sr_full(A, b, tol=1e-10)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-12)


def test_cg_sr_router_and_grad():
    """cg_sr through the unified router and the implicit-diff adjoint."""
    from tpu_sparse import solve
    from tpu_sparse.autodiff import cg_sr_diff
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(34)
    b = jnp.asarray(rng.standard_normal(n))
    x, r = solve(A, b, method="cg_sr", tol=1e-9)
    assert r.converged and r.method == "cg_sr"

    def loss(bb):
        return jnp.sum(cg_sr_diff(A, bb, tol=1e-12)[0] ** 2)

    g = jax.grad(loss)(b)
    e = jnp.zeros_like(b).at[5].set(1.0)
    h = 1e-6
    fd = (loss(b + h * e) - loss(b - h * e)) / (2 * h)
    np.testing.assert_allclose(float(g[5]), float(fd), rtol=1e-4)


def test_cg_sr_maxiter_semantics():
    """maxiter=0 must return x0 unchanged; maxiter=k runs exactly k
    x-updates (review finding: the old trailing half-step broke this)."""
    from tpu_sparse.solvers import cg_sr_full
    from tpu_sparse.sparse import generators

    A = generators.poisson2d(8)
    n = A.shape[0]
    rng = np.random.default_rng(35)
    b = jnp.asarray(rng.standard_normal(n))
    x0 = jnp.asarray(rng.standard_normal(n))
    x, info, k, res = cg_sr_full(A, b, x0, tol=1e-10, maxiter=0)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x0))
    assert int(k) == 0 and int(info) == -1
    # a converged x0 must come back bit-identical
    xs, _, _, _ = cg_sr_full(A, b, tol=1e-12, maxiter=1000)
    x2, info2, k2, _ = cg_sr_full(A, b, xs, tol=1e-6)
    assert int(k2) == 0
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(xs))


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
