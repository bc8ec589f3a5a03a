#!/usr/bin/env python3
"""Headline benchmark: CG time-to-tolerance + SpMV throughput on the
current default JAX backend (real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: CG time-to-tol=1e-6 on a 2-D 5-point Poisson system,
compared against the reference's RTX 4090 Module A CG numbers
(BASELINE.md; README.md:632-634 — 100x100 CG: 23.4 ms). vs_baseline is
baseline_time / our_time (higher is better, >1 beats the reference).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _block(x):
    return jax.block_until_ready(x)


def time_fn(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        _block(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from tpu_sparse.solvers import cg_full
    from tpu_sparse.sparse import generators
    from tpu_sparse.kernels import spmv

    dtype = np.float32  # TPU-native dtype for the hardware benchmark

    # --- headline: CG time-to-tol on 100x100 Poisson (matches the
    # reference's benchmark protocol sizes, benchmark.py:68-81) ---
    nx = 100
    A = generators.poisson2d(nx, dtype=dtype)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.standard_normal(n).astype(dtype))
    b = A @ x_true

    solve = jax.jit(lambda a, rhs: cg_full(a, rhs, tol=1e-6, maxiter=2000))
    t_cg = time_fn(solve, A, b)
    x, info, iters, res = solve(A, b)
    converged = int(info) == 0

    # --- SpMV throughput (nnz/s) on the 27-point 3-D Poisson stencil ---
    nx3 = 48
    A3 = generators.poisson3d_27pt(nx3, dtype=dtype)
    v = jnp.asarray(rng.standard_normal(A3.shape[0]).astype(dtype))
    mv = jax.jit(lambda a, x_: spmv(a, x_))
    t_spmv = time_fn(mv, A3, v)
    nnz = A3.nnz
    gnnz_s = nnz / t_spmv / 1e9

    baseline_ms = 23.4  # reference Module A CG 100x100 on RTX 4090
    ours_ms = t_cg * 1e3
    out = {
        "metric": "cg_time_to_tol_poisson2d_100x100",
        "value": round(ours_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ours_ms, 3),
        "extra": {
            "converged": converged,
            "iterations": int(iters),
            "residual": float(res),
            "spmv_27pt_gnnz_per_s": round(gnnz_s, 3),
            "spmv_27pt_n": int(A3.shape[0]),
            "backend": jax.default_backend(),
            "dtype": str(np.dtype(dtype)),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
