#!/usr/bin/env python3
"""Round-5: decompose the GMRES Arnoldi-step cost at the 110M-nnz size.

Chained-slope timing (K2-K1 iterations inside one jit program, data-
dependent chaining) — single-shot walls on the tunneled runtime measure
dispatch, not device time. A is always passed as an ARGUMENT: closing
over it embeds 440 MB of constants in the HLO and the tunnel rejects the
program with HTTP 413."""

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


def slope(make_chain, *args, K1=2, K2=12, reps=4):
    """min over reps of (t(K2)-t(K1))/(K2-K1); chain must be data-dep."""
    g1, g2 = make_chain(K1), make_chain(K2)
    jax.block_until_ready(g1(*args)), jax.block_until_ready(g2(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(g1(*args))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(g2(*args))
        tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / (K2 - K1))
    return max(best, 1e-9)


def main():
    from tpu_sparse.solvers import krylov as K

    A = generators.poisson3d_27pt(160, dtype=np.float32)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    m1p = 24  # restart=20 padded
    V = jnp.asarray((rng.standard_normal((m1p, n)) * 1e-3).astype(
        np.float32))

    def spmv_chain(Kn):
        return jax.jit(lambda a, x: jax.lax.fori_loop(
            0, Kn, lambda i, y: a @ y * 1e-4, x))

    t = slope(spmv_chain, A, w)
    print(f"[arnoldi-decomp] spmv_ms={t*1e3:.3f}", flush=True)

    for kplus in (1, 5, 11, 21):
        def ps_chain(Kn, kp=kplus):
            def one(i, x):
                h = K._project_on_prefix(V, x, kp)
                q = K._sub_from_prefix(V, h, x, kp)
                return q * (1.0 + 1e-6)

            return jax.jit(lambda V, x: jax.lax.fori_loop(0, Kn, one, x))

        t = slope(ps_chain, V, w)
        print(f"[arnoldi-decomp] proj+sub kplus={kplus} ms={t*1e3:.3f}",
              flush=True)

    # full Arnoldi step at k=10: chain V,H through repeated steps
    H0 = jnp.zeros((20, 24), jnp.float32)

    def step_chain(Kn):
        def one(i, c):
            V, H = c
            V2, H2, _ = K._kth_arnoldi_iteration(
                jnp.array(10, jnp.int32), lambda x: A_arg @ x,
                lambda x: x, V, H)
            return (V2, H2)

        def run(a, V, H):
            global A_arg
            A_arg = a  # bound per trace; a is a jit ARGUMENT
            return jax.lax.fori_loop(0, Kn, one, (V, H))

        return jax.jit(run)

    t = slope(step_chain, A, V, H0)
    print(f"[arnoldi-decomp] full_step_k10_ms={t*1e3:.3f}", flush=True)


if __name__ == "__main__":
    main()
