"""Auxiliary subsystems: checkpointing, LDC plot/state, inverse demo."""

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
