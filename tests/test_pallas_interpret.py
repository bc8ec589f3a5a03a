"""Pallas kernel logic exercised on CPU via the interpreter.

The compiled kernels only run on TPU; interpret mode validates the
chunking/halo/double-buffer index math in CI without hardware."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_sparse.kernels.pallas_spmv as ps
from tpu_sparse.kernels import reference as kref
from tpu_sparse.sparse import generators


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ps, "_INTERPRET", True)
    monkeypatch.setattr(ps, "_HAS_PALLAS", True)
    yield


@pytest.mark.parametrize("gen,n", [
    (lambda: generators.tridiagonal(1500, dtype=np.float32), 1500),
    (lambda: generators.poisson2d(40, dtype=np.float32), 1600),
])
def test_dia_kernel_interpreted(gen, n):
    A = gen()
    v = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(n).astype(np.float32))
    y = ps._dia_spmv_pallas_impl(A.data, v, offsets=A.offsets,
                                 shape=A.shape)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(kref.dia_spmv(A, v)),
                               rtol=1e-5, atol=1e-5)


def test_extended_kernel_interpreted():
    A = generators.poisson2d(40, dtype=np.float32)
    n = A.shape[0]
    op = ps.ExtendedStencilOperator(A)
    v = jnp.asarray(np.random.default_rng(1)
                    .standard_normal(n).astype(np.float32))
    y_ext = op(op.extend(v))
    # margins zero, values match the XLA oracle
    assert float(jnp.max(jnp.abs(y_ext[:op.Wl]))) == 0.0
    np.testing.assert_allclose(np.asarray(op.extract(y_ext)),
                               np.asarray(kref.dia_spmv(A, v)),
                               rtol=1e-5, atol=1e-5)


def test_df_kernel_interpreted():
    """Double-f32 f64 kernel: ~2^-45 accuracy vs the f64 oracle (plain
    f32 would be ~1e-7)."""
    A = generators.poisson2d(40)  # f64
    n = A.shape[0]
    op = ps.ExtendedStencilOperatorDF(A)
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(n))
    y = op.matvec64(v)
    assert y.dtype == jnp.float64
    y64 = np.asarray(kref.dia_spmv(A, v))
    rel = np.max(np.abs(np.asarray(y) - y64)) / np.max(np.abs(y64))
    assert rel < 1e-12, rel


def test_df_kernel_interpreted_illconditioned_values():
    """Values spanning many magnitudes. The Pallas interpreter forks the
    compensated sum's rounding by one ulp on some rows (see the note on
    _two_prod), so this only bounds the error near f32 eps here; the
    compiled kernel's true accuracy (4.6e-15 on this exact case) is
    asserted on hardware in test_tpu_validation.py."""
    A = generators.tridiagonal(1024)
    data = np.asarray(A.data) * (1 + 1e-9 * np.arange(A.data.shape[1]))
    data[:, ::7] *= 1e6
    A = A.with_data(jnp.asarray(data))
    op = ps.ExtendedStencilOperatorDF(A)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(1024) * 1e3)
    y64 = np.asarray(kref.dia_spmv(A, v))
    rel = np.max(np.abs(np.asarray(op.matvec64(v)) - y64)) \
        / np.max(np.abs(y64))
    assert rel < 5e-7, rel


@pytest.mark.parametrize("gen,n", [
    (lambda: generators.poisson2d(40, dtype=np.float32), 1600),
    (lambda: generators.tridiagonal(5000, dtype=np.float32), 5000),
    (lambda: generators.poisson3d_27pt(12, dtype=np.float32), 1728),
])
def test_extended_kernel_resident_interpreted(gen, n):
    """x-resident variant (no window DMAs) must match the windowed one
    and the XLA oracle, including margin zeroing."""
    A = gen()
    op = ps.ExtendedStencilOperator(A, resident=True)
    assert op.resident
    v = jnp.asarray(np.random.default_rng(2)
                    .standard_normal(n).astype(np.float32))
    y_ext = op(op.extend(v))
    assert float(jnp.max(jnp.abs(y_ext[:op.Wl]))) == 0.0
    assert float(jnp.max(jnp.abs(y_ext[op.Wl + n:]))) == 0.0
    np.testing.assert_allclose(np.asarray(op.extract(y_ext)),
                               np.asarray(kref.dia_spmv(A, v)),
                               rtol=1e-5, atol=1e-5)
    # windowed-DMA variant agrees
    op_w = ps.ExtendedStencilOperator(A, resident=False)
    assert not op_w.resident
    y_w = op_w.extract(op_w(op_w.extend(v)))
    np.testing.assert_allclose(np.asarray(op.extract(y_ext)),
                               np.asarray(y_w), rtol=1e-6, atol=1e-6)


def test_extended_resident_cap_falls_back():
    """Above the resident cap the operator must build windowed."""
    A = generators.tridiagonal(1024, dtype=np.float32)
    orig = ps._RESIDENT_E_CAP
    try:
        ps._RESIDENT_E_CAP = 512  # force over-cap
        op = ps.ExtendedStencilOperator(A)
        assert not op.resident
    finally:
        ps._RESIDENT_E_CAP = orig


def test_df_kernel_resident_interpreted():
    """x-resident DF variant matches the windowed DF kernel bit-for-bit
    structure-wise (same EFT math, different x delivery)."""
    was_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        A = generators.poisson2d(40)  # f64
        n = A.shape[0]
        op = ps.ExtendedStencilOperatorDF(A, resident=True)
        assert op.resident
        v = jnp.asarray(np.random.default_rng(3).standard_normal(n))
        y = op.matvec64(v)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(kref.dia_spmv(A, v)),
                                   rtol=1e-6, atol=1e-6)
        op_w = ps.ExtendedStencilOperatorDF(A, resident=False)
        assert not op_w.resident
        y_w = op_w.matvec64(v)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_w),
                                   rtol=1e-6, atol=1e-6)
    finally:
        jax.config.update("jax_enable_x64", was_x64)


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)
