"""Native (C++) AMG-setup kernel tests: build, correctness vs the scipy
path, and end-to-end equivalent convergence."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_sparse import native
from tpu_sparse.precond import amg_setup, amg_solve
from tpu_sparse.sparse import generators
from tpu_sparse.sparse.convert import to_csr

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _csr_np(A):
    Ac = to_csr(A)
    return (np.asarray(Ac.indptr), np.asarray(Ac.indices),
            np.asarray(Ac.data))


def test_aggregate_covers_all_nodes():
    A = generators.poisson2d(16)
    indptr, indices, data = _csr_np(A)
    agg, na = native.aggregate(indptr, indices, data, 0.08, 4)
    n = A.shape[0]
    assert agg.shape == (n,)
    assert agg.min() == 0 and agg.max() == na - 1
    assert set(np.unique(agg)) == set(range(na))
    # size-4 target: coarse grid is meaningfully smaller
    assert na <= n // 2


def test_rap_matches_scipy():
    import scipy.sparse as sp

    A = generators.poisson2d(12)
    indptr, indices, data = _csr_np(A)
    agg, na = native.aggregate(indptr, indices, data, 0.08, 4)
    ic, jc, vc = native.rap_pc(indptr, indices, data, agg, na)
    Ac_native = sp.csr_matrix((vc, jc, ic), shape=(na, na)).toarray()

    n = A.shape[0]
    P = sp.csr_matrix((np.ones(n), (np.arange(n), agg)), shape=(n, na))
    A_sp = sp.csr_matrix((data, indices, indptr), shape=A.shape)
    Ac_scipy = (P.T @ A_sp @ P).toarray()
    np.testing.assert_allclose(Ac_native, Ac_scipy, rtol=1e-12, atol=1e-12)


def test_l1_row_norms():
    A = generators.poisson2d(8)
    indptr, indices, data = _csr_np(A)
    out = native.l1_row_norms(indptr, data)
    import scipy.sparse as sp

    A_sp = sp.csr_matrix((data, indices, indptr), shape=A.shape)
    np.testing.assert_allclose(out,
                               np.abs(A_sp).sum(axis=1).A1
                               if hasattr(np.abs(A_sp).sum(axis=1), "A1")
                               else np.asarray(
                                   np.abs(A_sp).sum(axis=1)).ravel(),
                               rtol=1e-14)


def test_native_setup_solves_like_scipy_setup():
    A = generators.poisson2d(16)
    n = A.shape[0]
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    hn = amg_setup(A, use_native=True)
    hs = amg_setup(A, use_native=False)
    assert len(hn.levels) >= 1 and len(hs.levels) >= 1
    from tpu_sparse.precond import amg_preconditioner
    from tpu_sparse.solvers import cg_full

    for use_native in (True, False):
        x, info, iters, res = amg_solve(
            A, b, tol=1e-8,
            precond=None if use_native else None,
        )
        assert int(info) == 0
    # native-setup preconditioned CG converges fast
    from tpu_sparse.precond.amg import _make_vcycle_apply
    from jax.tree_util import Partial

    M = Partial(_make_vcycle_apply(0, 3, 0.9), hn)
    x, info, iters, _ = cg_full(A, b, tol=1e-8, M=M, maxiter=200)
    assert int(info) == 0
    assert int(iters) < 60


def test_native_cwell_pack_matches_numpy():
    """C++ CWELL pack must equal the numpy pack bit-for-bit."""
    import scipy.sparse as sp

    from tpu_sparse import native
    from tpu_sparse.sparse import cwell as cw
    from tpu_sparse.sparse.convert import csr_from_arrays

    if not native.available():
        pytest.skip("native toolchain unavailable")
    for seed, (n, m, dens, dt) in enumerate(
            [(500, 700, 0.05, np.float32), (130, 90, 0.3, np.float64)]):
        S = sp.random(n, m, density=dens, random_state=seed,
                      format="csr").astype(dt)
        S.sort_indices()
        A = csr_from_arrays(S.data, S.indices, S.indptr, S.shape)
        W = cw.csr_to_cwell(A)  # numpy path (nnz < 1M)
        packed = native.cwell_pack(np.asarray(A.indptr),
                                   np.asarray(A.indices),
                                   np.asarray(A.data), A.shape)
        assert packed is not None
        v, i2, sr, Sp = packed
        assert Sp == W.planes
        assert np.array_equal(v, np.asarray(W.vals))
        assert np.array_equal(i2, np.asarray(W.idx2))
        assert np.array_equal(sr, np.asarray(W.srow))


def test_cols_sorted_guard():
    from tpu_sparse.sparse.cwell import _cols_sorted

    indptr = np.array([0, 3, 5], np.int64)
    assert _cols_sorted(indptr, np.array([0, 2, 7, 1, 3], np.int64))
    assert not _cols_sorted(indptr, np.array([0, 7, 2, 1, 3], np.int64))
    # descending across a row boundary is fine
    assert _cols_sorted(indptr, np.array([5, 6, 9, 0, 1], np.int64))


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
