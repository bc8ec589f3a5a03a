#!/usr/bin/env python3
"""Round-5 one-off on-chip measurements (run once when the TPU tunnel is
up; results transcribed into docs/performance.md and guide bench.py).

Sections (each guarded, prints one line per result):
  1. supernodal at-scale: factor / transfer / compile / repeat / accuracy
  2. GMRES 110M with prefix-blocked CGS2 (r4: 401.8 ms)
  3. router ext CG 110M with the lazy SolverResult (r4: 142 ms)
  4. CWELL general SpMV group sweep incl. Q=8 (VERDICT #8 attempt)
  5. AMG anisotropic wall-win check (small-scale preflight of the bench
     row)
"""

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
from tpu_sparse.sparse.convert import to_csr


def wall(fn, *args, reps=5):
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


def sec1_supernodal():
    import scipy.sparse as sp

    from tpu_sparse.direct.supernodal import SupernodalLU

    from tpu_sparse.sparse.convert import csr_from_arrays

    Ag0 = to_csr(generators.poisson2d(512, dtype=np.float32))
    Asp = sp.csr_matrix((np.asarray(Ag0.data), np.asarray(Ag0.indices),
                         np.asarray(Ag0.indptr)), shape=Ag0.shape)
    Asp = (Asp + 0.1 * sp.triu(Asp, k=1)).tocsr().astype(np.float32)
    Ac = csr_from_arrays(Asp.data, Asp.indices, Asp.indptr, Asp.shape)
    rng = np.random.default_rng(0)
    xt = rng.standard_normal(Ac.shape[0]).astype(np.float32)
    b = jnp.asarray((Asp @ xt).astype(np.float32))
    t0 = time.time()
    lu = SupernodalLU.factor(Ac, with_transpose=False)
    t_factor = time.time() - t0
    gb = sum(l.nbytes for l in jax.tree_util.tree_leaves(lu)) / 1e9
    g = jax.jit(lambda l, bb: l.solve(bb))
    t0 = time.time()
    x = jax.block_until_ready(g(lu, b))
    t_first = time.time() - t0
    t_rep = wall(g, lu, b)
    rel = float(np.linalg.norm(np.asarray(b) - Asp @ np.asarray(x))
                / np.linalg.norm(np.asarray(b)))
    # refined (router program)
    from tpu_sparse.api.solver import _jitted_supernodal

    gr = _jitted_supernodal()
    t0 = time.time()
    jax.block_until_ready(gr(lu, Ac, b)[0])
    t_first_r = time.time() - t0
    t_rep_r = wall(lambda: gr(lu, Ac, b)[0])
    xr2, info_r, res_r, rel_r = gr(lu, Ac, b)
    print(f"[supernodal] n={Ac.shape[0]} levels={lu.n_levels} "
          f"GB={gb:.2f} factor_s={t_factor:.1f} first_s={t_first:.1f} "
          f"repeat_ms={t_rep*1e3:.1f} rel={rel:.1e} | refined: "
          f"first_s={t_first_r:.1f} repeat_ms={t_rep_r*1e3:.1f} "
          f"rel={float(rel_r):.1e}", flush=True)


def sec2_gmres110():
    from tpu_sparse.solvers import gmres_full

    A = generators.poisson3d_27pt(160, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = A @ jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    g = jax.jit(lambda a, rhs: gmres_full(a, rhs, tol=1e-6, restart=20,
                                          maxiter=500))
    t = wall(g, A, b, reps=3)
    _, info, it, res = g(A, b)
    print(f"[gmres110] ms={t*1e3:.1f} restarts={int(it)} "
          f"info={int(info)} (r4: 401.8)", flush=True)


def sec3_router_cg110():
    from tpu_sparse.api.solver import SparseSolver
    from tpu_sparse.solvers import cg_full

    A = generators.poisson3d_27pt(160, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = A @ jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    sv = SparseSolver()
    t_ext = wall(lambda: sv.solve(A, b, method="cg", tol=1e-6,
                                  maxiter=500)[0], reps=3)
    # direct fused benchmark for comparison
    from tpu_sparse.kernels.pallas_cg import (fused_cg_ext,
                                              make_fused_operator,
                                              pick_block_iters)

    opf = make_fused_operator(A)
    g0 = jax.jit(lambda o, rhs: fused_cg_ext(o, rhs, tol=1e-6,
                                             maxiter=500, block_iters=16))
    _, _, it0, _ = jax.block_until_ready(g0(opf, b))
    Kt = pick_block_iters(int(it0))
    gf = jax.jit(lambda o, rhs: fused_cg_ext(o, rhs, tol=1e-6,
                                             maxiter=500, block_iters=Kt))
    t_f = wall(gf, opf, b, reps=3)
    print(f"[router_cg110] ext_ms={t_ext*1e3:.1f} fused_ms={t_f*1e3:.1f} "
          f"ratio={t_ext/t_f:.2f} (r4: 142.0 vs 106.9)", flush=True)


def sec4_cwell_groups():
    from tpu_sparse.kernels.pallas_cwell import cwell_spmv_pallas
    from tpu_sparse.sparse.cwell import csr_to_cwell

    cpu0 = jax.devices("cpu")[0]
    A = to_csr(generators.poisson3d_27pt(64, dtype=np.float32))
    v = jnp.asarray(np.random.default_rng(0).standard_normal(
        A.shape[0]).astype(np.float32))
    for q in (1, 2, 4, 8):
        with jax.default_device(cpu0):
            W = csr_to_cwell(A, group=q)
        W = jax.device_put(W, jax.devices()[0])
        if cwell_spmv_pallas(W, v) is None:
            print(f"[cwell] Q={q}: kernel refused", flush=True)
            continue
        # chained-slope timing (dispatch cancels between K=10 and K=60)
        def chain(K):
            return jax.jit(lambda w, x: jnp.sum(jax.lax.fori_loop(
                0, K, lambda i, y: cwell_spmv_pallas(w, y), x)))

        g10, g60 = chain(10), chain(60)
        float(g10(W, v)), float(g60(W, v))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(g10(W, v))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(g60(W, v))
            tb = time.perf_counter() - t0
            ts.append(max((tb - ta) / 50, 1e-9))
        dt = min(ts)
        print(f"[cwell] Q={q}: planes={W.planes} fill={W.fill:.2f} "
              f"{W.nnz/dt/1e9:.1f} Gnnz/s", flush=True)


def sec5_amg_aniso():
    from tpu_sparse.precond.amg import amg_preconditioner
    from tpu_sparse.solvers.krylov import cg_full
    from tpu_sparse.api.solver import SparseSolver

    A = generators.poisson2d_anisotropic(1024, eps=1e-3, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    sv = SparseSolver()
    t_cg = wall(lambda: sv.solve(A, b, method="cg", tol=1e-5,
                                 maxiter=20000)[0], reps=2)
    t0 = time.time()
    M = amg_preconditioner(A, smoother="chebyshev", pre_sweeps=2,
                           post_sweeps=2, aggressive=1)
    t_set = time.time() - t0
    g = jax.jit(lambda a, rhs, m: cg_full(a, rhs, tol=1e-5, maxiter=500,
                                          M=m))
    t_amg = wall(lambda: g(A, b, M), reps=2)
    _, info, it, _ = g(A, b, M)
    print(f"[amg_aniso n={A.shape[0]}] cg_ms={t_cg*1e3:.0f} "
          f"amg_ms={t_amg*1e3:.0f} iters={int(it)} info={int(info)} "
          f"setup_s={t_set:.1f} speedup={t_cg/t_amg:.2f}", flush=True)


if __name__ == "__main__":
    # Run each section in its OWN process (pass names as argv): a tunnel
    # failure mid-section poisons the whole TPU client — the first run of
    # this script lost 4/5 sections to one remote-compile disconnect.
    sections = {"supernodal": sec1_supernodal,
                "gmres110": sec2_gmres110,
                "router_cg110": sec3_router_cg110,
                "cwell_groups": sec4_cwell_groups,
                "amg_aniso": sec5_amg_aniso}
    names = sys.argv[1:] or list(sections)
    for name in names:
        try:
            sections[name]()
        except Exception as e:
            print(f"[{name}] ERROR: {str(e)[:200]}", flush=True)
