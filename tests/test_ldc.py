"""FVM lid-driven cavity end-to-end test (reference FVM_example parity).

Checks: divergence-free flow after projection, physically-sensible lid-driven
circulation, and solver-backend pluggability."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
import pytest

from examples.ldc import LDCConfig, LDCSolver, build_pressure_matrix


def test_pressure_matrix_structure():
    A = build_pressure_matrix(8, 8, 0.125, 0.125)
    D = np.asarray(A.todense())
    np.testing.assert_allclose(D, D.T, atol=1e-12)  # symmetric
    # Neumann: zero row sums (constant null space)
    np.testing.assert_allclose(D.sum(axis=1), 0.0, atol=1e-9)
    # PSD: eigvals >= 0
    w = np.linalg.eigvalsh(D)
    assert w.min() > -1e-9


@pytest.mark.parametrize("solver_name", ["cg", "bicgstab"])
def test_ldc_short_run(solver_name):
    cfg = LDCConfig(nx=16, Re=100.0, solver=solver_name, tol=1e-8)
    s = LDCSolver(cfg)
    stats = s.run(10)
    # incompressibility enforced
    assert stats["mass_residual"] < 1e-6
    # lid drags fluid: top interior u must be positive, and some circulation
    u_top = float(jnp.mean(s.u[-2, 1:-1]))
    assert u_top > 0.01
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert np.all(np.isfinite(np.asarray(s.v)))


def test_ldc_gmres_and_direct_match_cg():
    """The reference ships per-backend LDC variants (module A gmres,
    module C cuDSS direct — ldc_solver_module_{a,c}.py); all pressure
    backends must produce the same flow field."""
    fields = {}
    for name in ("cg", "gmres", "direct"):
        cfg = LDCConfig(nx=12, Re=100.0, solver=name, tol=1e-10,
                        precond="none" if name == "direct" else "jacobi")
        s = LDCSolver(cfg)
        u, v, p = s.u, s.v, s.p
        for _ in range(30):
            u, v, p, mres, iters = s._step(u, v, p)
        assert float(mres) < 1e-5, (name, float(mres))
        if name == "direct":
            # direct projection solves the Poisson system exactly
            assert float(mres) < 1e-12
            assert int(iters) == 0
        fields[name] = np.asarray(u)
    for name in ("gmres", "direct"):
        np.testing.assert_allclose(fields[name], fields["cg"],
                                   atol=1e-8)


def test_pin_pressure_matrix_nonsingular():
    from examples.ldc.ldc_solver import pin_pressure_matrix

    A = build_pressure_matrix(6, 6, 1 / 6, 1 / 6)
    Ap = pin_pressure_matrix(A)
    D = np.asarray(Ap.todense())
    assert np.linalg.matrix_rank(D) == D.shape[0]
    np.testing.assert_allclose(D[0], np.eye(D.shape[0])[0], atol=0)


def test_ldc_amg_precond():
    cfg = LDCConfig(nx=16, Re=100.0, solver="cg", precond="amg", tol=1e-8)
    s = LDCSolver(cfg)
    stats = s.run(5)
    assert stats["mass_residual"] < 1e-6


def test_ldc_fsai_precond():
    cfg = LDCConfig(nx=16, Re=100.0, solver="cg", precond="fsai", tol=1e-8)
    s = LDCSolver(cfg)
    stats = s.run(5)
    assert stats["mass_residual"] < 1e-6


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
