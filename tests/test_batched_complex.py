"""Batched (vmapped) solves and complex-dtype support."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sparse.solvers import (
    batch_bicgstab,
    batch_cg,
    batch_direct,
    bicgstab,
    cg,
    cg_differentiable,
    gmres,
)
from tpu_sparse.sparse import generators
from tpu_sparse.sparse.convert import dense_to_csr


def test_batch_cg():
    n, k = 64, 4
    A = generators.tridiagonal(n)
    rng = np.random.default_rng(0)
    X_true = jnp.asarray(rng.standard_normal((n, k)))
    B = jnp.stack([A @ X_true[:, j] for j in range(k)], axis=1)
    X, infos, iters, res = batch_cg(A, B, tol=1e-10)
    assert X.shape == (n, k)
    assert np.all(np.asarray(infos) == 0)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_true),
                               rtol=1e-6, atol=1e-8)


def test_batch_direct():
    n, k = 64, 3
    A = generators.tridiagonal(n)
    rng = np.random.default_rng(1)
    X_true = jnp.asarray(rng.standard_normal((n, k)))
    B = jnp.stack([A @ X_true[:, j] for j in range(k)], axis=1)
    X = batch_direct(A, B)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_true),
                               rtol=1e-8, atol=1e-10)


def test_legacy_differentiable_alias():
    n = 32
    A = generators.tridiagonal(n)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(n))
    x, info = cg_differentiable(A, b, tol=1e-10)
    assert int(info) == 0
    g = jax.grad(lambda bb: jnp.sum(
        cg_differentiable(A, bb, tol=1e-12)[0] ** 2))(b)
    assert np.all(np.isfinite(np.asarray(g)))


def _hermitian_complex(n, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = B @ B.conj().T + n * np.eye(n)
    return jnp.asarray(A)


def test_cg_complex_hermitian():
    """Complex128 support (reference DEFAULT_COMPLEX_DTYPE,
    torch_sparse_linalg.py:57-58)."""
    n = 24
    A = _hermitian_complex(n)
    rng = np.random.default_rng(3)
    x_true = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    b = A @ x_true
    x, info = cg(A, b, tol=1e-12)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-8, atol=1e-9)


def test_gmres_complex():
    n = 24
    rng = np.random.default_rng(4)
    Ad = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
          + 4 * n * np.eye(n))
    A = jnp.asarray(Ad)
    x_true = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    b = A @ x_true
    x, info = gmres(A, b, tol=1e-12, restart=24)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-7, atol=1e-8)


def test_bicgstab_complex_sparse():
    n = 32
    rng = np.random.default_rng(5)
    Ad = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    Ad[np.abs(Ad) < 1.0] = 0
    Ad += 4 * n * np.eye(n)
    A = dense_to_csr(Ad)
    x_true = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    b = A @ x_true
    x, info = bicgstab(A, b, tol=1e-12)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                               rtol=1e-7, atol=1e-8)


def test_minres_complex_hermitian():
    """MINRES on a hermitian indefinite complex system."""
    from tpu_sparse.solvers import minres_full

    rng = np.random.default_rng(60)
    n = 48
    Q = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (Q + Q.conj().T) / 2
    H = H - 0.5 * np.trace(H).real / n * np.eye(n)  # push eigs both signs
    eig = np.linalg.eigvalsh(H)
    assert eig.min() < 0 < eig.max()
    x_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = jnp.asarray(H @ x_true)
    x, info, iters, res = minres_full(jnp.asarray(H), b, tol=1e-10,
                                      maxiter=2000)
    assert int(info) == 0, float(res)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)


def test_block_cg_complex_hpd():
    """Block CG on a hermitian positive-definite complex system."""
    from tpu_sparse.solvers import block_cg

    rng = np.random.default_rng(61)
    n, k = 40, 3
    Q = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = Q @ Q.conj().T / n + 2 * np.eye(n)
    X_true = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    B = jnp.asarray(H @ X_true)
    X, infos, iters, res = block_cg(jnp.asarray(H), B, tol=1e-10)
    assert np.all(np.asarray(infos) == 0)
    np.testing.assert_allclose(np.asarray(X), X_true, rtol=1e-6, atol=1e-7)


def test_batch_solvers_jit_traced_matrix():
    """Round-2 regression: jitting a batch_* solver with the MATRIX as a
    traced argument. batch_safe_matvec used to close over the container's
    leaves, which custom_vmap tried (and failed) to lift as jaxpr
    constants ("No constant handler for DynamicJaxprTracer" — the
    BENCH_r02 block_cg_error). Leaves are explicit operands now."""
    import numpy as np

    from tpu_sparse.solvers import batch_gmres

    A = generators.poisson2d(12, dtype=np.float32)
    rng = np.random.default_rng(5)
    B = jnp.asarray(rng.standard_normal((A.shape[0], 3)).astype(np.float32))

    f = jax.jit(lambda a, bb: batch_cg(a, bb, tol=1e-5, maxiter=2000))
    X, infos, _, _ = f(A, B)
    assert int(jnp.all(infos == 0)) == 1
    rel = float(jnp.linalg.norm(B - A @ X) / jnp.linalg.norm(B))
    assert rel < 1e-4

    g = jax.jit(lambda a, bb: batch_gmres(a, bb, tol=1e-5, restart=30,
                                          maxiter=500))
    X2, infos2, _, _ = g(A, B)
    rel2 = float(jnp.linalg.norm(B - A @ X2) / jnp.linalg.norm(B))
    assert rel2 < 1e-4


def test_complex_split_spmv_matches_reference():
    """The TPU complex fast path (re/im splitting over the real Pallas
    kernels, VERDICT r3 missing #3) must agree with the native complex
    XLA SpMV for complex A, complex x, and the mixed cases — checked here
    via the split helper directly (the dispatch gate is TPU-only)."""
    from tpu_sparse.kernels import _complex_split_spmv
    from tpu_sparse.kernels import reference as kref
    from tpu_sparse.sparse import generators
    from tpu_sparse.sparse.convert import to_csr
    from tpu_sparse.sparse.cwell import csr_to_cwell

    rng = np.random.default_rng(17)
    n = 96
    A = generators.tridiagonal(n)
    Ac = A.with_data(jnp.asarray(
        np.asarray(A.data) + 1j * rng.standard_normal(A.data.shape)))
    xc = jnp.asarray(rng.standard_normal(n)
                     + 1j * rng.standard_normal(n))
    for Amat, x in ((Ac, xc), (A, xc),
                    (Ac, jnp.asarray(rng.standard_normal(n)))):
        y = _complex_split_spmv(Amat, x)
        y_ref = kref.dia_spmv(Amat, x.astype(jnp.complex128))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-12, atol=1e-12)
    # CWELL variant (vals/with_data path)
    W = csr_to_cwell(to_csr(A))
    Wc = W.with_data(jnp.asarray(
        np.asarray(W.vals) * (1 + 0.5j)))
    y = _complex_split_spmv(Wc, xc)
    y_ref = kref.cwell_spmv(Wc, xc)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-12, atol=1e-12)


def test_complex_real_pair_embedding_solver():
    """The TPU complex path (real-pair embedding — the axon runtime
    cannot materialize complex arrays at all, r4): the embedded solve
    must match the native complex solver's solution."""
    from tpu_sparse.api.solver import SparseSolver
    from tpu_sparse.kernels import reference as kref
    from tpu_sparse.sparse import generators

    rng = np.random.default_rng(31)
    A = generators.poisson2d(16, dtype=np.float32)
    Ac = A.with_data(jnp.asarray(
        (np.asarray(A.data) * (1 + 0.2j)).astype(np.complex64)))
    xt = jnp.asarray((rng.standard_normal(256)
                      + 1j * rng.standard_normal(256)).astype(np.complex64))
    b = kref.dia_spmv(Ac, xt)
    s = SparseSolver()
    x, info, iters, res, rel = s._solve_complex_real_pair(
        Ac, b, "gmres", 1e-6, 0.0, 2000, 30, "batched")
    assert int(info) == 0
    true_rel = float(jnp.linalg.norm(kref.dia_spmv(Ac, x) - b)
                     / jnp.linalg.norm(b))
    assert true_rel < 1e-4, true_rel
    np.testing.assert_allclose(np.asarray(x), np.asarray(xt),
                               rtol=1e-3, atol=1e-3)


def test_complex_real_pair_complex_A_real_b_and_dense_numpy():
    """Review findings r4: a complex matrix with a REAL rhs must produce
    a complex solution through the embedding (not a real-cast one), and
    dense NUMPY complex operands must take the dense branch (ndarray
    .data is a memoryview, not container values)."""
    from tpu_sparse.api.solver import SparseSolver
    from tpu_sparse.kernels import reference as kref
    from tpu_sparse.sparse import generators

    rng = np.random.default_rng(41)
    A = generators.poisson2d(12, dtype=np.float32)
    Ac = A.with_data(jnp.asarray(
        (np.asarray(A.data) * (1 + 0.3j)).astype(np.complex64)))
    b_real = jnp.asarray(rng.standard_normal(144).astype(np.float32))
    s = SparseSolver()
    x, info, iters, res, rel = s._solve_complex_real_pair(
        Ac, b_real, "gmres", 1e-5, 0.0, 2000, 30, "batched")
    assert np.iscomplexobj(np.asarray(x))
    assert int(info) == 0
    r = np.asarray(kref.dia_spmv(Ac, x)) - np.asarray(
        b_real).astype(np.complex64)
    assert float(np.linalg.norm(r) / np.linalg.norm(np.asarray(b_real))) \
        < 1e-4

    # dense numpy complex matrix
    D = np.asarray(Ac.todense())
    x2, info2, *_ = s._solve_complex_real_pair(
        D, b_real, "gmres", 1e-5, 0.0, 2000, 30, "batched")
    assert int(info2) == 0
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)


def test_complex_pair_spmm():
    """Split-real complex SpMM matches the dense complex product
    (r5: complex SpMM capability without complex arrays on device)."""
    from tpu_sparse.kernels import complex_pair_spmm, split_complex_operator

    n, k = 96, 5
    rng = np.random.default_rng(5)
    Ad = generators.poisson2d(12, dtype=np.float64)  # structured pattern
    from tpu_sparse.sparse.convert import to_csr

    Ac = to_csr(Ad)
    vals = np.asarray(Ac.data)
    cvals = (vals + 1j * rng.standard_normal(vals.shape)).astype(
        np.complex128)
    n = Ac.shape[0]
    import scipy.sparse as sp

    A_sp = sp.csr_matrix((cvals, np.asarray(Ac.indices),
                          np.asarray(Ac.indptr)), shape=Ac.shape)
    B = (rng.standard_normal((n, k))
         + 1j * rng.standard_normal((n, k)))
    C_true = A_sp @ B

    Ac_cplx = Ac.with_data(cvals)
    Ar, Ai = split_complex_operator(Ac_cplx, real_dtype=jnp.float32)
    Cr, Ci = complex_pair_spmm(Ar, Ai,
                               jnp.asarray(B.real.astype(np.float32)),
                               jnp.asarray(B.imag.astype(np.float32)))
    C = np.asarray(Cr) + 1j * np.asarray(Ci)
    assert np.linalg.norm(C - C_true) / np.linalg.norm(C_true) < 1e-5


def test_complex_multirhs_router():
    """Complex (n, k) RHS through the router (native complex on CPU;
    the TPU real-pair embedding path is validated on chip)."""
    from tpu_sparse import solve

    n, k = 64, 3
    rng = np.random.default_rng(6)
    A = generators.tridiagonal(n, dtype=np.float64)
    dense = np.zeros((n, n), np.complex128)
    import numpy as _np

    data = _np.asarray(A.data)
    diag = data[1] + 1j * 0.3
    Ad = (_np.diag(diag) + _np.diag(data[0][1:], -1)
          + _np.diag(data[2][:-1], 1))
    Xt = (rng.standard_normal((n, k))
          + 1j * rng.standard_normal((n, k)))
    B = Ad @ Xt
    X, res = solve(jnp.asarray(Ad), jnp.asarray(B), method="gmres",
                   tol=1e-8, restart=30)
    assert res.converged
    assert np.linalg.norm(np.asarray(X) - Xt) / np.linalg.norm(Xt) < 1e-4
