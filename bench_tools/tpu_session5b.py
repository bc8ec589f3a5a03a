#!/usr/bin/env python3
"""Round-5 follow-up: GMRES 110M with the conditional second CGS pass
(krylov.py change AFTER tpu_session5 imported the module — sec2 there
measured prefix-blocking alone). One section, prints one line."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tpu_sparse.sparse import generators


def wall(fn, *args, reps=3):
    def force(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.sum(jnp.abs(leaf)))

    force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from tpu_sparse.solvers import gmres_full

    A = generators.poisson3d_27pt(160, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = A @ jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    g = jax.jit(lambda a, rhs: gmres_full(a, rhs, tol=1e-6, restart=20,
                                          maxiter=500))
    t = wall(g, A, b, reps=3)
    x, info, it, res = g(A, b)
    rel = float(jnp.linalg.norm(b - A @ x) / jnp.linalg.norm(b))
    print(f"[gmres110-condreorth] ms={t*1e3:.1f} restarts={int(it)} "
          f"info={int(info)} true_rel={rel:.2e} (r4: 401.8)", flush=True)


if __name__ == "__main__":
    main()
