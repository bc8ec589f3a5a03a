"""Fused whole-iteration Pallas CG (kernels/pallas_cg.py) — interpret-mode
parity against cg_full.

The compiled kernel only runs on TPU; interpret mode validates the fused
iteration's algebra (alpha/beta recurrences, rr history, margin handling,
freeze guard) on CPU. On-chip behavior is asserted in
tests/test_tpu_validation.py and measured in bench.py.
"""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_sparse.kernels.pallas_cg as pcg
import tpu_sparse.kernels.pallas_spmv as ps
from tpu_sparse.solvers import cg_full
from tpu_sparse.sparse import generators


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pcg, "_INTERPRET", True)
    monkeypatch.setattr(pcg, "_HAS_PALLAS", True)
    monkeypatch.setattr(ps, "_INTERPRET", True)
    monkeypatch.setattr(ps, "_HAS_PALLAS", True)
    yield


def _problem(rng, nx=40):
    A = generators.poisson2d(nx, dtype=np.float32)
    x_true = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    b = A @ x_true
    return A, b


def test_fused_cg_matches_cg_full(rng):
    A, b = _problem(rng)
    op = ps.ExtendedStencilOperator(A)
    assert pcg.supports_fused_cg(op)
    tol = 1e-5
    x_f, info_f, it_f, res_f = pcg.fused_cg_ext(op, b, tol=tol,
                                                maxiter=600, block_iters=8)
    x_r, info_r, it_r, res_r = cg_full(A, b, tol=tol, maxiter=600)
    assert int(info_f) == 0
    assert int(info_r) == 0
    # same recurrence, same stopping rule -> same iteration count (allow
    # +-1 for the fused kernel's f32 single-stream reductions)
    assert abs(int(it_f) - int(it_r)) <= 1, (int(it_f), int(it_r))
    # true residual honors the contract
    b_norm = float(jnp.linalg.norm(b))
    true_res = float(jnp.linalg.norm(b - A @ x_f))
    assert true_res <= 2 * tol * b_norm, true_res / b_norm
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r),
                               rtol=5e-3, atol=5e-4)


def test_fused_cg_freeze_guard_overshoot(rng):
    """A converged system must survive extra fused iterations: alpha is
    guarded to 0 once pAp ~ 0, so overshooting launches are identity."""
    A, b = _problem(rng, nx=16)  # small: converges well inside one launch
    op = ps.ExtendedStencilOperator(A)
    x_f, info_f, it_f, res_f = pcg.fused_cg_ext(op, b, tol=1e-5,
                                                maxiter=4000,
                                                block_iters=64)
    assert int(info_f) == 0
    assert np.all(np.isfinite(np.asarray(x_f)))
    b_norm = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(b - A @ x_f)) <= 2e-5 * b_norm
    # iteration count reports the first crossing, not the launch boundary
    assert int(it_f) < 64 * ((int(it_f) // 64) + 1)


def test_fused_cg_iteration_history_monotone_tail(rng):
    """The reported residual equals the rr-history value at the crossing."""
    A, b = _problem(rng)
    op = ps.ExtendedStencilOperator(A)
    tol = 1e-4
    x_f, info_f, it_f, res_f = pcg.fused_cg_ext(op, b, tol=tol,
                                                maxiter=600, block_iters=8)
    assert int(info_f) == 0
    assert float(res_f) <= tol * float(jnp.linalg.norm(b))


def test_fused_jacobi_pcg_matches_cg_full(rng):
    """Fused Jacobi-PCG (dinv resident in VMEM): iteration parity and
    solution agreement with the while-loop preconditioned cg_full."""
    import jax.tree_util as jtu

    A, b = _problem(rng)
    # a non-trivial diagonal so PCG differs from plain CG
    d = np.asarray(A.data[A.offsets.index(0)]).copy()
    d *= (1.0 + 0.5 * np.abs(np.sin(np.arange(d.shape[0]))))
    A = A.with_data(jnp.asarray(np.asarray(A.data)).at[
        A.offsets.index(0)].set(jnp.asarray(d.astype(np.float32))))
    dinv = jnp.asarray((1.0 / d).astype(np.float32))
    op = ps.ExtendedStencilOperator(A)
    tol = 1e-5
    x_f, info_f, it_f, _ = pcg.fused_cg_ext(op, b, tol=tol, maxiter=800,
                                            block_iters=8, dinv=dinv)
    M = jtu.Partial(lambda dd, v: dd * v, dinv)
    x_r, info_r, it_r, _ = cg_full(A, b, tol=tol, maxiter=800, M=M)
    assert int(info_f) == 0 and int(info_r) == 0
    assert abs(int(it_f) - int(it_r)) <= 1, (int(it_f), int(it_r))
    b_norm = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(b - A @ x_f)) <= 2 * tol * b_norm
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_r),
                               rtol=5e-3, atol=5e-4)
    # the preconditioner actually engaged: plain CG takes a different
    # iteration count on this scaled system
    _, _, it_plain, _ = pcg.fused_cg_ext(op, b, tol=tol, maxiter=800,
                                         block_iters=8)
    assert int(it_plain) != int(it_f)


def test_ext_router_jacobi_routes_to_fused(rng):
    """ext_krylov_diff with a diagonal Partial M uses the fused PCG."""
    from jax.tree_util import Partial

    from tpu_sparse.autodiff.implicit import ext_krylov_diff
    from tpu_sparse.precond.jacobi import _apply_diag

    A, b = _problem(rng, nx=24)
    dinv = jnp.asarray(
        1.0 / np.asarray(A.data[A.offsets.index(0)]).astype(np.float32))
    M = Partial(_apply_diag, dinv)
    opts = (("tol", 1e-6), ("atol", 0.0), ("maxiter", 800))
    x, info, iters, res = ext_krylov_diff("cg", opts, A, b, None, M)
    assert int(info) == 0
    b_norm = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(b - A @ x)) <= 2e-6 * b_norm


def test_ext_router_path_uses_fused_and_stays_differentiable(rng):
    """ext_krylov_diff routes unpreconditioned f32 CG through the fused
    kernel (make_fused_operator) and the custom_vjp adjoint still flows:
    grad wrt b matches A^{-T} cotangent by the implicit-diff contract."""
    from tpu_sparse.autodiff.implicit import ext_krylov_diff

    A, b = _problem(rng, nx=24)
    opf = pcg.make_fused_operator(A)
    assert opf is not None and pcg.supports_fused_cg(opf)
    opts = (("tol", 1e-6), ("atol", 0.0), ("maxiter", 800))
    x, info, iters, res = ext_krylov_diff("cg", opts, A, b, None, None)
    assert int(info) == 0
    b_norm = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(b - A @ x)) <= 2e-6 * b_norm

    def loss(bb):
        xx, *_ = ext_krylov_diff("cg", opts, A, bb, None, None)
        return jnp.sum(xx ** 2)

    g = jax.grad(loss)(b)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on one coordinate
    e = jnp.zeros_like(b).at[7].set(1e-2)
    fd = (loss(b + e) - loss(b - e)) / 2e-2
    np.testing.assert_allclose(float(g[7]), float(fd), rtol=2e-2)


def test_supports_fused_cg_rejects():
    A64 = generators.poisson2d(16)  # f64
    op64 = ps.ExtendedStencilOperatorDF(A64)
    assert not pcg.supports_fused_cg(op64)  # not an ExtendedStencilOperator
    A = generators.poisson2d(16, dtype=np.float32)
    op = ps.ExtendedStencilOperator(A)
    big_E = pcg._FUSED_E_CAP + op.C
    old = op.E
    try:
        op.E = big_E
        assert not pcg.supports_fused_cg(op)
    finally:
        op.E = old


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
