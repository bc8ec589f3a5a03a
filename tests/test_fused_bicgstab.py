"""Fused whole-iteration Pallas BiCGStab (kernels/pallas_bicgstab.py) —
interpret-mode parity against bicgstab_full."""

import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
import pytest

import tpu_sparse.kernels.pallas_bicgstab as pbi
import tpu_sparse.kernels.pallas_spmv as ps
from tpu_sparse.solvers import bicgstab_full
from tpu_sparse.sparse import generators


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pbi, "_INTERPRET", True)
    monkeypatch.setattr(pbi, "_HAS_PALLAS", True)
    monkeypatch.setattr(ps, "_INTERPRET", True)
    monkeypatch.setattr(ps, "_HAS_PALLAS", True)
    yield


def _nonsym_problem(rng, nx=24):
    A = generators.poisson2d(nx, dtype=np.float32)
    data = np.asarray(A.data).copy()
    offs = list(A.offsets)
    data[offs.index(-1)] *= 1.3   # upwind skew: nonsymmetric
    data[offs.index(1)] *= 0.7
    A = A.with_data(jnp.asarray(data))
    x_true = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    return A, A @ x_true, x_true


def test_fused_bicgstab_matches_bicgstab_full(rng):
    A, b, x_true = _nonsym_problem(rng)
    op = ps.ExtendedStencilOperator(A)
    assert pbi.supports_fused_bicgstab(op)
    tol = 1e-5
    x_f, info_f, it_f, res_f = pbi.fused_bicgstab_ext(
        op, b, tol=tol, maxiter=600, block_iters=6)
    x_r, info_r, it_r, res_r = bicgstab_full(A, b, tol=tol, maxiter=600)
    assert int(info_f) == 0, int(info_f)
    assert int(info_r) == 0
    # identical recurrence and stopping rule → iteration parity (±2 for
    # single-stream f32 reduction order)
    assert abs(int(it_f) - int(it_r)) <= 2, (int(it_f), int(it_r))
    b_norm = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(b - A @ x_f)) <= 2 * tol * b_norm
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_true),
                               rtol=2e-3, atol=2e-3)


def test_fused_bicgstab_overshoot_freeze(rng):
    """Launch overshoot past convergence must stay finite and converged
    (division guards freeze the degenerate tail iterations)."""
    A, b, _ = _nonsym_problem(rng, nx=12)
    op = ps.ExtendedStencilOperator(A)
    x_f, info_f, it_f, _ = pbi.fused_bicgstab_ext(
        op, b, tol=1e-5, maxiter=3000, block_iters=48)
    assert int(info_f) == 0
    assert np.all(np.isfinite(np.asarray(x_f)))
    b_norm = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(b - A @ x_f)) <= 2e-5 * b_norm


def test_fused_bicgstab_singular_reports_failure(rng):
    """A singular system must not report success: either a breakdown
    code or -1 from the true-residual check."""
    A = generators.poisson2d(12, dtype=np.float32)
    data = np.asarray(A.data).copy()
    offs = list(A.offsets)
    # zero row sums -> singular (pure Neumann-like)
    data[offs.index(0)] = -(data.sum(axis=0) - data[offs.index(0)])
    A = A.with_data(jnp.asarray(data))
    b = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    op = ps.ExtendedStencilOperator(A)
    x_f, info_f, it_f, _ = pbi.fused_bicgstab_ext(
        op, b, tol=1e-10, maxiter=400, block_iters=8)
    assert int(info_f) != 0


@pytest.fixture
def rng():
    return np.random.default_rng(0)


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
