"""Container + conversion + kernel correctness vs scipy oracles.

Mirrors the reference's fixture pattern: deterministic generators and
b = A @ x_true ground truth (SURVEY.md §4)."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpu_sparse.kernels import reference as kref
from tpu_sparse.kernels import spmm, spmv
from tpu_sparse.sparse import (
    COO, CSR, DIA,
    coo_to_csr, csr_to_bsr, csr_to_dia, dense_to_coo, dense_to_csr, generators,
)


def random_dense(rng, n, m, density=0.3):
    A = rng.standard_normal((n, m))
    A[rng.random((n, m)) > density] = 0.0
    return A


@pytest.mark.parametrize("n,m", [(17, 17), (32, 48), (5, 3)])
def test_dense_csr_roundtrip(rng, n, m):
    A = random_dense(rng, n, m)
    Acsr = dense_to_csr(A)
    np.testing.assert_allclose(np.asarray(Acsr.todense()), A, atol=1e-14)
    Acoo = dense_to_coo(A)
    np.testing.assert_allclose(np.asarray(Acoo.todense()), A, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(coo_to_csr(Acoo).todense()), A, atol=1e-14)


@pytest.mark.parametrize("fmt", ["csr", "coo", "dia", "bsr"])
def test_spmv_matches_scipy(rng, fmt):
    n = 64
    A = random_dense(rng, n, n, density=0.2)
    x = rng.standard_normal(n)
    expected = A @ x
    Acsr = dense_to_csr(A)
    if fmt == "csr":
        op = Acsr
    elif fmt == "coo":
        op = Acsr.tocoo()
    elif fmt == "dia":
        op = csr_to_dia(Acsr, max_diags=256)
        assert op is not None
    else:
        op = csr_to_bsr(Acsr, 8)
    got = np.asarray(spmv(op, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)
    # __matmul__ operator
    got2 = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got2, expected, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("fmt", ["csr", "coo", "dia", "bsr"])
def test_spmm_matches_scipy(rng, fmt):
    n, k = 48, 5
    A = random_dense(rng, n, n, density=0.2)
    B = rng.standard_normal((n, k))
    expected = A @ B
    Acsr = dense_to_csr(A)
    op = {
        "csr": Acsr,
        "coo": Acsr.tocoo(),
        "dia": csr_to_dia(Acsr, max_diags=256),
        "bsr": csr_to_bsr(Acsr, 8),
    }[fmt]
    got = np.asarray(spmm(op, jnp.asarray(B)))
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_transpose(rng):
    n = 40
    A = random_dense(rng, n, n, density=0.2)
    Acsr = dense_to_csr(A)
    np.testing.assert_allclose(np.asarray(Acsr.T.todense()), A.T, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(Acsr.tocoo().T.todense()), A.T, atol=1e-14)
    Adia = csr_to_dia(Acsr, max_diags=256)
    np.testing.assert_allclose(np.asarray(Adia.T.todense()), A.T, atol=1e-14)


def test_generators_match_scipy_stencils():
    # tridiagonal: scipy oracle
    n = 25
    T = generators.tridiagonal(n)
    S = sp.diags([[-1.0] * (n - 1), [2.0] * n, [-1.0] * (n - 1)],
                 [-1, 0, 1]).toarray()
    np.testing.assert_allclose(np.asarray(T.todense()), S, atol=1e-14)

    # poisson2d: compare against kron-built 5-point laplacian
    nx = 7
    I = sp.eye(nx)
    T1 = sp.diags([[-1.0] * (nx - 1), [2.0] * nx, [-1.0] * (nx - 1)],
                  [-1, 0, 1])
    L = sp.kron(I, T1) + sp.kron(T1, I)
    P = generators.poisson2d(nx)
    np.testing.assert_allclose(np.asarray(P.todense()), L.toarray(),
                               atol=1e-14)


def test_poisson3d_27pt_structure():
    nx = 4
    A = generators.poisson3d_27pt(nx)
    D = np.asarray(A.todense())
    # symmetric, diagonally dominant
    np.testing.assert_allclose(D, D.T, atol=1e-6)
    assert np.all(np.diag(D) == 26.0)
    off = D - np.diag(np.diag(D))
    assert np.all(np.abs(off).sum(axis=1) <= 26.0)
    # interior node has all 26 neighbors
    interior = (nx * nx + nx + 1)
    assert (D[interior] != 0).sum() == 27


def test_spmv_jit_and_grad(rng):
    """SpMV must be jittable and linear-differentiable in data and x."""
    n = 32
    A = dense_to_csr(random_dense(rng, n, n, density=0.3))
    x = jnp.asarray(rng.standard_normal(n))

    f = jax.jit(lambda a, v: spmv(a, v))
    np.testing.assert_allclose(np.asarray(f(A, x)), np.asarray(spmv(A, x)),
                               atol=1e-14)

    # d/d data of sum(A@x) == x[indices] summed per entry position
    g = jax.grad(lambda d: jnp.sum(spmv(A.with_data(d), x)))(A.data)
    expected = np.asarray(x)[np.asarray(A.indices)]
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-12)


def test_dia_spmv_rectangular():
    # offsets reaching outside a rectangular matrix
    data = jnp.ones((2, 3))
    A = DIA(data, (0, 2), (3, 5))
    x = jnp.arange(5.0)
    got = np.asarray(kref.dia_spmv(A, x))
    D = np.asarray(A.todense())
    np.testing.assert_allclose(got, D @ np.arange(5.0), atol=1e-14)


def test_to_tpu_operator_selection(rng):
    from tpu_sparse.sparse import BELL, to_tpu_operator
    from tpu_sparse.sparse.convert import to_csr

    # stencil -> DIA
    assert isinstance(to_tpu_operator(to_csr(generators.poisson2d(8))), DIA)
    # unstructured -> CSR
    Au = random_dense(rng, 64, 64, density=0.05)
    from tpu_sparse.sparse.containers import CSR as CSRt

    assert isinstance(to_tpu_operator(dense_to_csr(Au)), CSRt)


def test_duplicate_entries_sum_in_all_conversions(rng):
    """Duplicate COO entries must sum through every conversion path."""
    from tpu_sparse.sparse.containers import COO
    from tpu_sparse.sparse import coo_to_csr, csr_to_dia, csr_to_bsr

    A = COO(jnp.asarray([1.0, 2.0, 5.0]),
            jnp.asarray([0, 0, 3], dtype=jnp.int32),
            jnp.asarray([0, 0, 2], dtype=jnp.int32), (8, 8))
    dense = np.asarray(A.todense())
    assert dense[0, 0] == 3.0
    Acsr = coo_to_csr(A)
    Adia = csr_to_dia(Acsr)
    np.testing.assert_allclose(np.asarray(Adia.todense()), dense)
    Absr = csr_to_bsr(Acsr, 4)
    np.testing.assert_allclose(np.asarray(Absr.todense()), dense)


def test_promoted_operator_fuzz_matches_csr_oracle():
    """Whatever format to_tpu_operator picks, spmv/spmm must match the
    CSR oracle (dispatch-regression fuzz across structures/dtypes)."""
    import scipy.sparse as sp

    from tpu_sparse.kernels import spmm, spmv
    from tpu_sparse.sparse.convert import csr_from_arrays
    from tpu_sparse.sparse.optimize import to_tpu_operator

    rng = np.random.default_rng(70)
    cases = []
    # banded
    cases.append(sp.diags([rng.standard_normal(99), 4 + np.zeros(100),
                           rng.standard_normal(99)],
                          [-1, 0, 1]).tocsr())
    # random blocks
    Bsp = sp.random(120, 120, density=0.05, random_state=7,
                    format="csr")
    cases.append(Bsp + sp.eye(120))
    # clustered columns (CWELL-friendly)
    rows = np.repeat(np.arange(256), 6)
    cols = (rows // 128) * 300 + rng.integers(0, 200, rows.size)
    cases.append(sp.coo_matrix(
        (rng.standard_normal(rows.size), (rows, cols % 500)),
        shape=(256, 500)).tocsr())
    for i, S in enumerate(cases):
        S = S.tocsr().astype(np.float32)
        A = csr_from_arrays(S.data, S.indices, S.indptr, S.shape)
        W = to_tpu_operator(A)
        x = jnp.asarray(rng.standard_normal(S.shape[1]).astype(
            np.float32))
        np.testing.assert_allclose(np.asarray(spmv(W, x)), S @
                                   np.asarray(x), rtol=2e-4, atol=2e-4,
                                   err_msg=f"case {i} {type(W).__name__}")
        B = jnp.asarray(rng.standard_normal((S.shape[1], 3)).astype(
            np.float32))
        np.testing.assert_allclose(np.asarray(spmm(W, B)), S @
                                   np.asarray(B), rtol=2e-4, atol=2e-4,
                                   err_msg=f"case {i} {type(W).__name__}")


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
