"""Numerics parity with jax.scipy.sparse.linalg.

The reference's Module A docstrings promise JAX-matching numerics
(torch_sparse_linalg.py:647-649 "should exactly match JAX's GMRES").
Here we hold our from-scratch solvers to the same bar against JAX's own
implementations, plus randomized SpMV fuzzing against scipy."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.scipy.sparse.linalg as jsl
import numpy as np
import pytest
import scipy.sparse as sp

from tpu_sparse.kernels import spmv
from tpu_sparse.solvers import bicgstab, cg, gmres
from tpu_sparse.sparse import generators
from tpu_sparse.sparse.convert import csr_from_arrays


def _mv(A):
    return lambda v: A @ v


def test_cg_matches_jax():
    A = generators.tridiagonal(80)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(80))
    x_ours, info = cg(A, b, tol=1e-10, maxiter=500)
    x_jax, _ = jsl.cg(_mv(A), b, tol=1e-10, maxiter=500)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x_ours), np.asarray(x_jax),
                               rtol=1e-10, atol=1e-12)


def test_bicgstab_matches_jax():
    A = generators.convection_diffusion(80)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(80))
    x_ours, info = bicgstab(A, b, tol=1e-10, maxiter=500)
    x_jax, _ = jsl.bicgstab(_mv(A), b, tol=1e-10, maxiter=500)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x_ours), np.asarray(x_jax),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("solve_method", ["batched", "incremental"])
def test_gmres_matches_jax(solve_method):
    A = generators.convection_diffusion(80)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(80))
    x_ours, info = gmres(A, b, tol=1e-10, restart=25,
                         solve_method=solve_method, maxiter=500)
    x_jax, _ = jsl.gmres(_mv(A), b, tol=1e-10, restart=25,
                         solve_method=solve_method, maxiter=500)
    assert int(info) == 0
    np.testing.assert_allclose(np.asarray(x_ours), np.asarray(x_jax),
                               rtol=1e-6, atol=1e-9)


def test_spmv_fuzz_vs_scipy():
    """Randomized CSR/DIA SpMV against scipy for many shapes/densities."""
    rng = np.random.default_rng(3)
    for trial in range(8):
        n = int(rng.integers(3, 120))
        m = int(rng.integers(3, 120))
        density = float(rng.uniform(0.02, 0.6))
        M = sp.random(n, m, density=density, random_state=int(
            rng.integers(0, 2**31)), format="csr")
        A = csr_from_arrays(M.data, M.indices, M.indptr, (n, m))
        x = rng.standard_normal(m)
        got = np.asarray(spmv(A, jnp.asarray(x)))
        np.testing.assert_allclose(got, M @ x, rtol=1e-10, atol=1e-12,
                                   err_msg=f"trial {trial} n={n} m={m}")


def test_dia_fuzz_random_offsets():
    rng = np.random.default_rng(4)
    from tpu_sparse.sparse.containers import DIA

    for trial in range(8):
        n = int(rng.integers(5, 100))
        k = int(rng.integers(1, min(7, n)))
        offsets = sorted(rng.choice(
            np.arange(-(n - 1), n), size=k, replace=False).tolist())
        data = np.zeros((k, n))
        for d, o in enumerate(offsets):
            i0, i1 = max(0, -o), min(n, n - o)
            data[d, i0:i1] = rng.standard_normal(max(0, i1 - i0))
        A = DIA(jnp.asarray(data), tuple(offsets), (n, n))
        x = rng.standard_normal(n)
        got = np.asarray(spmv(A, jnp.asarray(x)))
        # independent oracle straight from the raw arrays (not the
        # library's todense, which could share a convention bug):
        # convention: data[d, i] = A[i, i + offsets[d]]
        dense = np.zeros((n, n))
        for d, o in enumerate(offsets):
            i0, i1 = max(0, -o), min(n, n - o)
            rows = np.arange(i0, i1)
            dense[rows, rows + o] = data[d, i0:i1]
        np.testing.assert_allclose(got, dense @ x, rtol=1e-10, atol=1e-12,
                                   err_msg=f"trial {trial} offsets {offsets}")


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
