"""Auxiliary subsystems: checkpointing, LDC plot/state, inverse demo."""


import os as _os
import sys as _sys

if __name__ == "__main__":  # allow `python tests/test_*.py` before package imports
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sparse.utils.checkpoint import load_pytree, save_pytree


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 3)), jnp.zeros(1))}
    p = str(tmp_path / "ckpt.npz")
    save_pytree(p, tree)
    restored = load_pytree(p, tree)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(restored["b"][0]), np.ones((2, 3)))


def test_ldc_state_and_plot(tmp_path):
    from examples.ldc import LDCConfig, LDCSolver

    cfg = LDCConfig(nx=8, solver="cg", tol=1e-8)
    s = LDCSolver(cfg)
    s.run(3)
    state = str(tmp_path / "state.npz")
    s.save_state(state)

    s2 = LDCSolver(cfg)
    s2.restore_state(state)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s.u))

    png = str(tmp_path / "ldc.png")
    s.save_plot(png)
    assert os.path.getsize(png) > 1000


def test_inverse_poisson_reduces_error():
    import examples.inverse_poisson as ip

    err = ip.main(["--n", "24", "--steps", "40"])
    assert err < 0.4  # started at 0.8 (sigma=1 vs range [1, 1.8])


def test_checkpoint_shape_dtype_validation(tmp_path):
    import jax.numpy as jnp
    import pytest

    tree = {"u": jnp.zeros((4, 4)), "p": jnp.zeros(16)}
    p = str(tmp_path / "state.npz")
    save_pytree(p, tree)
    with pytest.raises(ValueError, match="shape"):
        load_pytree(p, {"u": jnp.zeros((8, 8)), "p": jnp.zeros(16)})
    with pytest.raises(ValueError, match="dtype"):
        load_pytree(p, {"u": jnp.zeros((4, 4)),
                        "p": jnp.zeros(16, jnp.float32)})


def test_operand_cache_content_invalidation():
    """Rebinding a container's arrays must invalidate derived caches
    (mutated-in-place workflows; ROADMAP round-2 item 7)."""
    from tpu_sparse.api.solver import SparseSolver
    from tpu_sparse.sparse import generators
    from tpu_sparse.utils.opcache import OperandCache

    # unit level
    cache = OperandCache()
    A = generators.tridiagonal(32)
    calls = []
    build = lambda: calls.append(1) or len(calls)  # noqa: E731
    assert cache.get_or_build(A, build) == 1
    assert cache.get_or_build(A, build) == 1  # hit
    A.data = A.data * 2.0  # rebind content
    assert cache.get_or_build(A, build) == 2  # rebuilt

    # end to end: AMG hierarchy cache keyed on content, solving after an
    # in-place data swap must converge against the NEW matrix
    s = SparseSolver()
    A2 = generators.poisson2d(12)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(A2.shape[0]))
    x1, r1 = s.solve(A2, b, method="amg")
    assert r1.converged
    A2.data = A2.data * 3.0  # in-place rescale: hierarchy must rebuild
    x2, r2 = s.solve(A2, b, method="amg")
    assert r2.converged
    np.testing.assert_allclose(np.asarray(x2) * 3.0, np.asarray(x1),
                               rtol=1e-4, atol=1e-6)


if __name__ == "__main__":  # standalone entry (reference test_module_a.py:358-377)
    from _standalone import run_standalone

    run_standalone(__file__)


def test_batched_device_put_roundtrip():
    """utils/transfer: packed per-dtype transfer reproduces every leaf
    (shape, dtype, values) and passes non-arrays through."""
    import numpy as np

    from tpu_sparse.utils.transfer import batched_device_put

    rng = np.random.default_rng(0)
    tree = {
        "f32": [rng.standard_normal((3, 5)).astype(np.float32),
                rng.standard_normal(7).astype(np.float32)],
        "i32": np.arange(11, dtype=np.int32).reshape(1, 11),
        "f64": rng.standard_normal((2, 2, 2)),
        "scalar": 42,
        "none": None,
    }
    out = batched_device_put(tree)
    np.testing.assert_array_equal(np.asarray(out["f32"][0]),
                                  tree["f32"][0])
    np.testing.assert_array_equal(np.asarray(out["f32"][1]),
                                  tree["f32"][1])
    np.testing.assert_array_equal(np.asarray(out["i32"]), tree["i32"])
    np.testing.assert_array_equal(np.asarray(out["f64"]), tree["f64"])
    assert out["scalar"] == 42 and out["none"] is None
