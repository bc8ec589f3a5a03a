"""Mixed-precision defect-correction solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sparse.solvers import bicgstab_refined, cg_refined, gmres_refined
from tpu_sparse.sparse import generators


def _setup(gen, n=64, seed=0):
    A = gen(n)
    x_true = jnp.asarray(np.random.default_rng(seed).standard_normal(n))
    return A, A @ x_true, x_true


def test_cg_refined_reaches_f64_tol():
    A, b, x_true = _setup(generators.tridiagonal)
    x, info, inner_iters, res = cg_refined(A, b, tol=1e-10)
    assert int(info) == 0
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-10  # beyond f32 reach: proves refinement works
    assert int(inner_iters) > 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-8, atol=1e-9)


def test_bicgstab_refined_nonsymmetric():
    A, b, x_true = _setup(generators.convection_diffusion)
    x, info, _, res = bicgstab_refined(A, b, tol=1e-10)
    assert int(info) == 0
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-10


def test_gmres_refined():
    A, b, x_true = _setup(generators.convection_diffusion)
    x, info, _, res = gmres_refined(A, b, tol=1e-10, restart=30)
    assert int(info) == 0
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-10


def test_refined_jit():
    A, b, _ = _setup(generators.tridiagonal)
    f = jax.jit(lambda a, rhs: cg_refined(a, rhs, tol=1e-10)[0])
    x = f(A, b)
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-10


def test_refined_matrix_free():
    A, b, _ = _setup(generators.tridiagonal)

    def op(v):
        return A @ v

    x, info, _, _ = cg_refined(op, b, tol=1e-10)
    assert int(info) == 0
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-10


def test_bicgstab_refined_illcond_tridiag():
    # Round-1 benchmark cells that stalled: mixed-precision BiCGStab on the
    # n=500 tridiagonal (condition ~1e5) at tol=1e-8. The full-precision
    # rescue sweep in refined_solve must close them.
    A, b, x_true = _setup(generators.tridiagonal, n=500, seed=3)
    x, info, _, res = bicgstab_refined(A, b, tol=1e-8, maxiter=5000)
    assert int(info) == 0
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-8


def test_gmres_refined_illcond_tridiag():
    A, b, x_true = _setup(generators.tridiagonal, n=500, seed=4)
    x, info, _, res = gmres_refined(A, b, tol=1e-8, restart=30, maxiter=5000)
    assert int(info) == 0
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    assert rel < 1e-8
