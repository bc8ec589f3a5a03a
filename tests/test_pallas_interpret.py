"""Pallas kernel logic exercised on CPU via the interpreter.

The compiled kernels only run on TPU; interpret mode validates the
chunking/halo/double-buffer index math in CI without hardware."""

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
