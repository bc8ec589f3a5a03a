#!/usr/bin/env python3
"""Round-4 on-chip session: fused whole-iteration Pallas CG A/B vs cg_full
at the 110M-nnz headline size (VERDICT r3 item 1).

    python bench_tools/tpu_session4.py [--nx 160] [--block-iters 16]

Prints one labelled line per measurement (not the driver bench format —
that stays bench.py)."""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import wall_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--block-iters", type=int, nargs="*",
                    default=[8, 16, 32])
    ap.add_argument("--chunks", type=int, nargs="*", default=[None])
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    from tpu_sparse.kernels import pallas_cg as pcg
    from tpu_sparse.kernels import pallas_spmv as ps
    from tpu_sparse.solvers import cg_full
    from tpu_sparse.sparse import generators

    rng = np.random.default_rng(0)
    nx = args.nx
    A = generators.poisson3d_27pt(nx, dtype=np.float32)
    n = A.shape[0]
    x_true = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = A @ x_true
    b_norm = float(jnp.linalg.norm(b))
    print(f"n={n} nnz={A.nnz}", flush=True)

    # baseline: cg_full (the r3 headline path)
    gref = jax.jit(lambda a, rhs: cg_full(a, rhs, tol=1e-6, maxiter=500))
    t_ref = wall_time(gref, A, b, warmup=1, iters=3)
    xr, info_r, it_r, res_r = jax.block_until_ready(gref(A, b))
    print(f"cg_full: {t_ref*1e3:.1f} ms iters={int(it_r)} "
          f"info={int(info_r)} res={float(res_r)/b_norm:.2e} "
          f"eff={A.nnz*int(it_r)/t_ref/1e9:.1f} Gnnz/s", flush=True)

    for chunk in args.chunks:
        kw = {} if chunk is None else dict(chunk=chunk, resident=True)
        op = ps.ExtendedStencilOperator(A, **kw)
        print(f"op: C={op.C} E={op.E} resident={op.resident} "
              f"supports_fused={pcg.supports_fused_cg(op)}", flush=True)
        if not pcg.supports_fused_cg(op):
            continue

        for K in args.block_iters:
            try:
                gf = jax.jit(lambda o, rhs, K=K: pcg.fused_cg_ext(
                    o, rhs, tol=1e-6, maxiter=500, block_iters=K))
                t0 = time.perf_counter()
                out = jax.block_until_ready(gf(op, b))
                t_compile = time.perf_counter() - t0
                xf, info_f, it_f, res_f = out
                true_res = float(jnp.linalg.norm(b - A @ xf)) / b_norm
                t_f = wall_time(gf, op, b, warmup=0, iters=3)
                print(f"fused C={op.C} K={K}: {t_f*1e3:.1f} ms "
                      f"iters={int(it_f)} "
                      f"info={int(info_f)} "
                      f"rep_res={float(res_f)/b_norm:.2e} "
                      f"true_res={true_res:.2e} "
                      f"eff={A.nnz*int(it_f)/t_f/1e9:.1f} Gnnz/s "
                      f"(compile {t_compile:.0f}s)", flush=True)
            except Exception as e:
                print(f"fused C={op.C} K={K} FAILED: {str(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    main()
