#!/usr/bin/env python3
"""Headline benchmark on the current default JAX backend (real TPU chip
under the driver). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: Pallas 27-point 3-D Poisson SpMV throughput (Gnnz/s) — the
north-star metric from BASELINE.json ("SpMV nnz/s/chip at HBM
speed-of-light"). Extras report the CG time-to-tolerance comparison against
the reference's RTX 4090 fp64 protocol (BASELINE.md: CG 500x500 = 46.2 ms,
tol=1e-8; README.md:632-634). vs_baseline for the headline is the measured
fraction of the v5e HBM speed-of-light bound (~820 GB/s) — >0.7 means the
kernel is within 30% of the hardware roofline. NOTE (r3): byte accounting
for the x-resident kernel counts data stream + y write only (x stays in
VMEM across the chained loop), which is stricter than the r1/r2 3-vector
accounting — compare vs_baseline across rounds with that in mind;
`spmv_27pt_frac_of_measured_hbm` (vs the same-session stream-triad
ceiling) is the round-robust roofline number.

Methodology: the remote TPU runtime has ~27 ms fixed dispatch latency per
program launch, so per-op cost is measured as the slope between chained
K1- and K2-iteration jitted loops (dispatch cancels out). Solve benchmarks
report both wall time (dispatch included, like the reference's protocol)
and on-device time (slope).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def _probe_backend(timeout_s: int = 180) -> bool:
    """True if the default JAX backend initializes in a subprocess.

    The tunneled TPU runtime can wedge such that jax.devices() blocks
    forever (observed r5: multi-hour outage); probing in a subprocess
    lets the bench fall back to CPU instead of hanging the driver."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        return proc.returncode == 0
    except Exception:
        return False


_BACKEND_OK = _probe_backend()

import jax

if not _BACKEND_OK:
    # must happen before first backend use; env vars do not override
    jax.config.update("jax_platforms", "cpu")
    print("WARNING: default backend unreachable (tunnel down?); "
          "running the bench on CPU", file=sys.stderr, flush=True)
import jax.numpy as jnp
import numpy as np
from jax import lax

HBM_SPEED_OF_LIGHT_GBS = 820.0  # TPU v5e


def _chain_time(op, v, K, reps=5):
    """Time K dependent applications of op in ONE dispatch, forcing
    completion with a scalar device→host fetch (block_until_ready does not
    reliably block on the remote runtime). Min over reps: the shared chip
    shows large run-to-run variance."""
    g = jax.jit(lambda x: jnp.sum(lax.fori_loop(0, K, lambda i, y: op(y), x)))
    float(g(v))  # warmup + force
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(v))
        times.append(time.perf_counter() - t0)
    return min(times)


def per_iter_time(op, v, K1=5, K2=50):
    t1 = _chain_time(op, v, K1)
    t2 = _chain_time(op, v, K2)
    return max((t2 - t1) / (K2 - K1), 1e-9)


def wall_time(fn, *args, warmup=2, iters=5):
    """Wall time per call including dispatch, forcing completion by
    fetching a scalar from the first output leaf."""

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(jnp.abs(leaf)))

    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _progress(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# Soft deadline for the OPTIONAL trailing sections (LDC e2e, CPU-mesh
# weak-scaling subprocesses): if the headline + solver rows have already
# consumed this much wall time (slow chip day, cold caches), skip the
# remainder so the driver's capture window always gets the final summary
# line rather than a timeout kill.
_SOFT_DEADLINE_S = 1800.0
_T0 = time.perf_counter()


def _past_deadline(extra, section):
    if time.perf_counter() - _T0 > _SOFT_DEADLINE_S:
        extra[f"{section}_skipped"] = "soft deadline"
        return True
    return False


def main():
    from tpu_sparse.kernels import spmv
    from tpu_sparse.solvers import cg_refined
    from tpu_sparse.sparse import generators

    rng = np.random.default_rng(0)
    extra = {"backend": jax.default_backend()}

    _progress("headline spmv")
    # --- headline: 27-pt 3-D Poisson SpMV, f32, n = 128^3, measured on
    # the extended-space operator (the pad-free kernel the router's fast
    # path actually uses) ---
    nx3 = 128
    A3 = generators.poisson3d_27pt(nx3, dtype=np.float32)
    n3 = A3.shape[0]
    v0 = jnp.asarray(rng.standard_normal(n3).astype(np.float32))
    scale = np.float32(1.0 / 27.0)
    from tpu_sparse.kernels.pallas_spmv import make_extended_operator

    # Insurance ladder: x-resident Pallas -> DMA-windowed Pallas -> XLA
    # reference. The shared remote chip shows transient device errors
    # (UNAVAILABLE) some sessions; each rung retries once so a hiccup
    # cannot zero out the round's headline.
    def _try_kernel(build_op, label):
        for attempt in range(2):
            try:
                op_ = build_op()
                if op_ is None:
                    return None
                v_ = op_.extend(v0) if hasattr(op_, "extend") else v0
                dt_ = per_iter_time(lambda y: op_(y) * scale, v_)
                extra["spmv_27pt_kernel"] = label
                return dt_
            except Exception as e:
                extra[f"spmv_27pt_{label}_error"] = str(e)[:120]
        return None

    from tpu_sparse.kernels.pallas_spmv import ExtendedStencilOperator

    dt = None
    op = make_extended_operator(A3)
    if op is not None:
        dt = _try_kernel(
            lambda: op,
            "resident" if getattr(op, "resident", False) else "windowed")
        if dt is None and getattr(op, "resident", False):
            dt = _try_kernel(
                lambda: ExtendedStencilOperator(A3, resident=False),
                "windowed")
    if dt is None:
        class _Plain:
            def __call__(self, y):
                return spmv(A3, y)

        dt = _try_kernel(_Plain, "xla_reference")
    if dt is None:
        # every rung failed twice: do NOT synthesize a timing — mark the
        # failure explicitly and null the derived headline metrics
        # (errors per rung are already in extra)
        extra["spmv_27pt_failed"] = True
        gnnz = None
        frac_sol = None
    else:
        gnnz = A3.nnz / dt / 1e9
    bw = None
    if dt is not None:
        if extra.get("spmv_27pt_kernel") == "resident":
            # x lives in VMEM across the chained loop (that is the point
            # of the resident variant), so per-iteration HBM traffic is
            # the data stream + the y write; counting 3 vector passes
            # here over-reports bandwidth past the physical roofline
            bytes_per = A3.nnz * 4 + n3 * 4
        else:
            bytes_per = A3.nnz * 4 + 3 * n3 * 4
        bw = bytes_per / dt / 1e9
        frac_sol = bw / HBM_SPEED_OF_LIGHT_GBS
        extra.update({
            "spmv_27pt_n": n3,
            "spmv_27pt_us": round(dt * 1e6, 1),
            "spmv_27pt_gbs": round(bw, 1),
        })

    _progress("hbm triad")
    # --- measured HBM roofline: stream-triad probe (y = a*x + y over a
    # working set far past VMEM). Nominal 820 GB/s is a paper number; the
    # achievable copy bandwidth on a real chip is lower, and the kernel
    # should be judged against THAT (VERDICT r2 item 4) ---
    try:
        big = jnp.asarray(
            rng.standard_normal(64 * 1024 * 1024).astype(np.float32))
        a_c = np.float32(1.000001)

        # `big` must be a jit ARGUMENT: closed over, it becomes a 256 MB
        # constant baked into the remote compile upload (HTTP 413).
        # a*z + big (not a*big + z): the latter is loop-invariant and XLA
        # would hoist it, collapsing the triad to a 2-vector axpy.
        def _triad_time(K, reps=5):
            g = jax.jit(lambda x, y: jnp.sum(lax.fori_loop(
                0, K, lambda i, z: a_c * z + y, x)))
            float(g(big, big))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g(big, big))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt_tri = max((_triad_time(50) - _triad_time(5)) / 45, 1e-9)
        # triad moves 3 vectors (read z, read y, write z) of 256 MB
        hbm_meas = 3 * big.nbytes / dt_tri / 1e9
        extra["hbm_triad_gbs_measured"] = round(hbm_meas, 1)
        if bw is not None:
            extra["spmv_27pt_frac_of_measured_hbm"] = round(
                bw / hbm_meas, 3)
        del big
    except Exception as e:  # pragma: no cover
        extra["hbm_triad_error"] = str(e)[:120]

    _progress("cg tridiag500")
    # --- reference-protocol CG: fp64-accurate solve, tridiagonal n=500 ---
    jax.config.update("jax_enable_x64", True)
    A = generators.tridiagonal(500)
    x_true = jnp.asarray(rng.standard_normal(500))
    b = A @ x_true
    try:
        solve = jax.jit(
            lambda a, rhs: cg_refined(a, rhs, tol=1e-8, maxiter=5000))
        t_wall = wall_time(solve, A, b)
        x, info, iters, res = jax.block_until_ready(solve(A, b))
        extra.update({
            "cg_tridiag500_wall_ms": round(t_wall * 1e3, 2),
            "cg_tridiag500_vs_rtx4090": round(46.2 / (t_wall * 1e3), 2),
            "cg_converged": bool(int(info) == 0),
            "cg_inner_iters": int(iters),
            "cg_residual": float(res),
        })
    except Exception as e:  # pragma: no cover - never fail the bench
        extra["cg_tridiag500_error"] = str(e)[:120]

    _progress("gmres/direct 500")
    # --- the reference's other two headline rows at n=500 (BASELINE.md:
    # GMRES 515.7 ms, cuDSS direct 21.4 ms on the RTX 4090) ---
    try:
        from tpu_sparse.direct import direct_solve
        from tpu_sparse.solvers import gmres_refined

        gsolve = jax.jit(lambda a, rhs: gmres_refined(
            a, rhs, tol=1e-8, restart=20, maxiter=5000))
        t_g = wall_time(gsolve, A, b)
        xg5, info_g, _, res_g = jax.block_until_ready(gsolve(A, b))
        dsolve = jax.jit(direct_solve)
        t_d = wall_time(dsolve, A, b)
        xd5 = jax.block_until_ready(dsolve(A, b))
        res_d = float(jnp.linalg.norm(b - A @ xd5)
                      / jnp.linalg.norm(b))
        # slope-based on-device time for the direct solve (dispatch
        # cancels): chain x_{k+1} = A^{-1} x_k — same program as the
        # wall-time row minus the ~27 ms remote-dispatch constant.
        # n=500 is a ~100 us op; the chain must be long enough that the
        # K2-K1 delta (100 iters) clears the ~1 ms dispatch jitter.
        t_d_dev = per_iter_time(lambda y: direct_solve(A, y), b,
                                K1=10, K2=210)
        extra.update({
            "gmres_tridiag500_wall_ms": round(t_g * 1e3, 2),
            "gmres_tridiag500_vs_rtx4090": round(515.7 / (t_g * 1e3), 1),
            "gmres_converged": bool(int(info_g) == 0),
            "direct_tridiag500_wall_ms": round(t_d * 1e3, 2),
            "direct_tridiag500_vs_rtx4090": round(21.4 / (t_d * 1e3), 2),
            "direct_rel_residual": res_d,
        })
        if t_d_dev > 5e-6:  # below that the slope is dispatch noise
            extra.update({
                "direct_tridiag500_device_ms": round(t_d_dev * 1e3, 3),
                "direct_tridiag500_device_vs_rtx4090": round(
                    21.4 / (t_d_dev * 1e3), 1),
            })
        else:
            extra["direct_tridiag500_device_ms_note"] = (
                "slope below measurement floor (< 5 us/solve): the "
                "on-device solve is fully dispatch-dominated")
    except Exception as e:  # pragma: no cover - never fail the bench
        extra["headline500_error"] = str(e)[:120]

    _progress("general direct")
    # --- general sparse direct at scale (SupernodalLU: ND ordering +
    # level-scheduled device solves — the cuDSS capability class,
    # cudss_solver.py:176-252). n=262144 skewed 2-D Poisson as general
    # CSR (nonsymmetric, no structure hint to the solver) ---
    try:
        import scipy.sparse as sp

        from tpu_sparse.api.solver import SparseSolver
        from tpu_sparse.sparse.convert import csr_from_arrays, to_csr

        jax.config.update("jax_enable_x64", False)
        Ag0 = to_csr(generators.poisson2d(512, dtype=np.float32))
        Asp = sp.csr_matrix((np.asarray(Ag0.data), np.asarray(Ag0.indices),
                             np.asarray(Ag0.indptr)), shape=Ag0.shape)
        Asp = (Asp + 0.1 * sp.triu(Asp, k=1)).tocsr().astype(np.float32)
        Agen = csr_from_arrays(Asp.data, Asp.indices, Asp.indptr, Asp.shape)
        xg_t = rng.standard_normal(Agen.shape[0]).astype(np.float32)
        bgen = jnp.asarray((Asp @ xg_t).astype(np.float32))
        sv = SparseSolver()
        t0 = time.perf_counter()
        lu_sn = sv._supernodal_lu(Agen)   # pure factorization (cached)
        t_factor = time.perf_counter() - t0
        t0 = time.perf_counter()
        xg1, rg1 = sv.solve(Agen, bgen, method="direct")
        t_first = time.perf_counter() - t0   # compile + first solve
        ok1 = bool(rg1.converged)  # force the lazy fetch before timing
        t_rep = wall_time(lambda: sv.solve(Agen, bgen, method="direct")[0],
                          warmup=1, iters=3)
        extra.update({
            "general_direct_n": int(Agen.shape[0]),
            "general_direct_setup_s": round(t_factor, 1),
            "general_direct_first_solve_s": round(t_first, 1),
            "general_direct_repeat_ms": round(t_rep * 1e3, 1),
            "general_direct_kernel": ("supernodal"
                                      if lu_sn.device_capable
                                      else "host_splu"),
            "general_direct_levels": int(lu_sn.n_levels),
            "general_direct_converged": ok1,
            "general_direct_rel_residual": float(rg1.residual),
        })
        del Agen, bgen, Asp
    except Exception as e:  # pragma: no cover
        extra["general_direct_error"] = str(e)[:120]

    _progress("cwell spmv")
    # --- general-structure (CWELL) Pallas SpMV: the cuSPARSE-capability
    # path for arbitrary matrices, measured on the 27-pt system packed as
    # a general CSR (no stencil structure assumed) ---
    try:
        from tpu_sparse.kernels.pallas_cwell import cwell_spmv_pallas
        from tpu_sparse.sparse.convert import to_csr
        from tpu_sparse.sparse.cwell import csr_to_cwell

        from tpu_sparse.sparse.cwell import AUTO_GROUP

        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            Wg = csr_to_cwell(to_csr(generators.poisson3d_27pt(
                64, dtype=np.float32)), group=AUTO_GROUP)
        Wg = jax.device_put(Wg, jax.devices()[0])
        vg = jnp.asarray(rng.standard_normal(
            Wg.shape[0]).astype(np.float32))
        if cwell_spmv_pallas(Wg, vg) is not None:
            # sanity-bounded slope: the shared chip occasionally returns
            # a ~zero K2-K1 delta (two runs land on identical walls);
            # anything implying >200 Gnnz/s for a gather kernel is a
            # glitch — retry once, else mark it
            for _attempt in range(2):
                dtg = per_iter_time(
                    lambda y: cwell_spmv_pallas(Wg, y) * scale, vg,
                    K1=10, K2=110)
                if Wg.nnz / dtg / 1e9 < 200.0:
                    break
            rate_g = Wg.nnz / dtg / 1e9
            if rate_g < 200.0:
                extra.update({
                    "cwell_general_spmv_gnnz_per_s": round(rate_g, 2),
                    "cwell_general_spmv_us": round(dtg * 1e6, 1),
                })
            else:
                extra["cwell_general_spmv_glitch"] = round(rate_g, 1)
    except Exception as e:  # pragma: no cover - never fail the bench
        extra["cwell_general_spmv_error"] = str(e)[:120]

    _progress("cwell spmm")
    # --- CWELL SpMM (one-hot MXU) + block CG vs vmapped batch ---
    try:
        from tpu_sparse.kernels import reference as _kref2
        from tpu_sparse.kernels.pallas_cwell import cwell_spmm_pallas

        Bg = jnp.asarray(rng.standard_normal(  # NameError if Wg absent
            (Wg.shape[1], 32)).astype(np.float32))
        if cwell_spmm_pallas(Wg, Bg) is not None:
            dts = per_iter_time(
                lambda y: cwell_spmm_pallas(Wg, y) * scale, Bg,
                K1=3, K2=15)
            dtx = per_iter_time(
                lambda y: _kref2.cwell_spmm(Wg, y) * scale, Bg,
                K1=1, K2=3)
            extra.update({
                "cwell_spmm32_gnnz_per_s": round(
                    Wg.nnz * 32 / dts / 1e9, 2),
                "cwell_spmm32_vs_xla": round(dtx / dts, 1),
            })
        del Bg
    except Exception as e:  # pragma: no cover
        extra["cwell_spmm_error"] = str(e)[:120]

    try:
        from tpu_sparse.solvers import batch_cg, block_cg

        jax.config.update("jax_enable_x64", False)
        Ab = generators.poisson2d(96, dtype=np.float32)  # n=9216
        Bb = jnp.asarray(rng.standard_normal(
            (Ab.shape[0], 8)).astype(np.float32))
        fblk = jax.jit(lambda a, bb: block_cg(a, bb, tol=1e-5,
                                              maxiter=2000))
        fbat = jax.jit(lambda a, bb: batch_cg(a, bb, tol=1e-5,
                                              maxiter=2000))
        t_blk = wall_time(fblk, Ab, Bb, warmup=1, iters=3)
        t_bat = wall_time(fbat, Ab, Bb, warmup=1, iters=3)
        Xb, inf_b, it_blk, _ = fblk(Ab, Bb)
        extra.update({
            "block_cg_8rhs_ms": round(t_blk * 1e3, 1),
            "block_cg_8rhs_iters": int(it_blk),
            "block_cg_8rhs_converged": bool(
                int(jnp.all(inf_b == 0)) == 1),
            "block_cg_vs_batch_cg": round(t_bat / t_blk, 2),
        })
        del Ab, Bb
    except Exception as e:  # pragma: no cover
        extra["block_cg_error"] = str(e)[:120]

    _progress("cg 110M")
    # --- >100M-nnz 27-pt CG time-to-tol (north-star target) ---
    try:
        jax.config.update("jax_enable_x64", False)
        Abig = generators.poisson3d_27pt(160, dtype=np.float32)
        from tpu_sparse.solvers import cg_full

        xb = jnp.asarray(
            rng.standard_normal(Abig.shape[0]).astype(np.float32))
        bb = Abig @ xb
        gbig = jax.jit(lambda a, rhs: cg_full(a, rhs, tol=1e-6,
                                              maxiter=500))
        t_big = wall_time(gbig, Abig, bb, warmup=1, iters=3)
        xg, info_b, it_b, res_b = gbig(Abig, bb)
        extra.update({
            "cg_110M_nnz": int(Abig.nnz),
            "cg_110M_while_ms": round(t_big * 1e3, 1),
            "cg_110M_iters": int(it_b),
            "cg_110M_converged": bool(int(info_b) == 0),
        })
        best_t, best_it, best_info, best_kernel = (
            t_big, int(it_b), info_b, "while_loop")

        # fused whole-iteration Pallas CG (r4): x/r/p live in VMEM, the
        # only per-iteration HBM traffic is the diagonal stream; block
        # size tuned to the measured iteration count after a first solve
        try:
            from tpu_sparse.kernels.pallas_cg import (
                fused_cg_ext, make_fused_operator, pick_block_iters,
                supports_fused_cg)

            opf = make_fused_operator(Abig)
            if opf is not None and supports_fused_cg(opf):
                def _fused(K):
                    return jax.jit(lambda o, rhs: fused_cg_ext(
                        o, rhs, tol=1e-6, maxiter=500, block_iters=K))

                g0 = _fused(16)
                _, info_f0, it_f0, _ = jax.block_until_ready(g0(opf, bb))
                Kt = pick_block_iters(int(it_f0))
                gf = _fused(Kt)
                t_f = wall_time(gf, opf, bb, warmup=1, iters=3)
                xf, info_f, it_f, res_f = gf(opf, bb)
                true_rel = float(jnp.linalg.norm(bb - Abig @ xf)
                                 / jnp.linalg.norm(bb))
                extra.update({
                    "cg_110M_fused_ms": round(t_f * 1e3, 1),
                    "cg_110M_fused_iters": int(it_f),
                    "cg_110M_fused_true_rel_res": true_rel,
                    "cg_110M_fused_C": int(opf.C),
                    "cg_110M_fused_K": int(Kt),
                })
                if int(info_f) == 0 and true_rel <= 2e-6 \
                        and t_f < best_t:
                    best_t, best_it, best_info, best_kernel = (
                        t_f, int(it_f), info_f, "fused_pallas")
        except Exception as e:
            extra["cg_110M_fused_error"] = str(e)[:120]

        extra.update({
            "cg_110M_ms": round(best_t * 1e3, 1),
            "cg_110M_iters": best_it,
            "cg_110M_converged": bool(int(best_info) == 0),
            "cg_110M_kernel": best_kernel,
            "cg_110M_gnnz_per_s_effective": round(
                Abig.nnz * best_it / best_t / 1e9, 1),
        })
        # the router's extended-space fast path (pad-free resident
        # Pallas SpMV inside the while-loop) — what solve() users get
        from tpu_sparse.api.solver import SparseSolver

        sbig = SparseSolver()
        t_ext = wall_time(
            lambda: sbig.solve(Abig, bb, method="cg", tol=1e-6,
                               maxiter=500)[0], warmup=1, iters=3)
        _, r_ext = sbig.solve(Abig, bb, method="cg", tol=1e-6,
                              maxiter=500)
        extra.update({
            "cg_110M_router_ext_ms": round(t_ext * 1e3, 1),
            "cg_110M_router_ext_converged": bool(r_ext.converged),
            "cg_110M_router_ext_gnnz_per_s_effective": round(
                Abig.nnz * (r_ext.iterations or 1) / t_ext / 1e9, 1),
        })
        from tpu_sparse.bench.harness import device_peak_memory_mb

        peak_mb = device_peak_memory_mb()
        if peak_mb is not None:
            extra["cg_110M_peak_hbm_mb"] = round(peak_mb, 1)

        # --- AMG-PCG at the same 110M-nnz scale (VERDICT r3 next #4):
        # the reference's capability triangle is Krylov+AMG+direct
        # (torch_amgx.py:50-99); the at-scale evidence must cover AMG too
        _progress("amg-pcg 110M")
        try:
            from tpu_sparse.precond.amg import amg_preconditioner

            t0 = time.perf_counter()
            # chebyshev V(2,2): strongest measured config at this scale
            # (r4 sweep: 154 ms/15 iters vs 302 ms/28 for jacobi V(1,1))
            Mamg = amg_preconditioner(Abig, smoother="chebyshev",
                                      pre_sweeps=2, post_sweeps=2)
            t_setup_amg = time.perf_counter() - t0
            gam = jax.jit(lambda a, rhs, m: cg_full(
                a, rhs, tol=1e-6, maxiter=200, M=m))
            t_amg = wall_time(lambda: gam(Abig, bb, Mamg), warmup=1,
                              iters=3)
            xa, info_a, it_a, _ = gam(Abig, bb, Mamg)
            extra.update({
                "amg_pcg_110M_setup_s": round(t_setup_amg, 1),
                "amg_pcg_110M_ms": round(t_amg * 1e3, 1),
                "amg_pcg_110M_iters": int(it_a),
                "amg_pcg_110M_converged": bool(int(info_a) == 0),
                "amg_pcg_110M_vs_plain_cg_iters": round(
                    best_it / max(int(it_a), 1), 1),
                "amg_pcg_110M_vs_plain_cg_wall": round(
                    best_t / t_amg, 2),
            })
            del Mamg, xa
        except Exception as e:  # pragma: no cover
            extra["amg_pcg_110M_error"] = str(e)[:120]

        # --- stiff anisotropic system: where AMG beats plain CG on WALL
        # (VERDICT r4 #6). eps=1e-3 anisotropy: plain CG needs thousands
        # of iterations; aggressive (pairwise^2) coarsening gives a
        # ratio-4, ~7-level hierarchy (vs ratio-2/13 plain) whose PCG
        # converges in ~100 ---
        _progress("amg aniso")
        try:
            from tpu_sparse.precond.amg import amg_preconditioner

            Aan = generators.poisson2d_anisotropic(
                2048, eps=1e-3, dtype=np.float32)
            ban = jnp.asarray(rng.standard_normal(
                Aan.shape[0]).astype(np.float32))
            # plain CG through the router ext fast path (fused kernel)
            from tpu_sparse.api.solver import SparseSolver

            sva = SparseSolver()
            t_cg_an = wall_time(
                lambda: sva.solve(Aan, ban, method="cg", tol=1e-5,
                                  maxiter=20000)[0], warmup=1, iters=3)
            _, r_an = sva.solve(Aan, ban, method="cg", tol=1e-5,
                                maxiter=20000)
            t0 = time.perf_counter()
            Man = amg_preconditioner(Aan, smoother="chebyshev",
                                     pre_sweeps=2, post_sweeps=2,
                                     aggressive=1)
            t_setup_an = time.perf_counter() - t0
            gan = jax.jit(lambda a, rhs, m: cg_full(
                a, rhs, tol=1e-5, maxiter=500, M=m))
            t_amg_an = wall_time(lambda: gan(Aan, ban, Man), warmup=1,
                                 iters=3)
            _, info_an, it_an, _ = gan(Aan, ban, Man)
            extra.update({
                "aniso_n": int(Aan.shape[0]),
                "aniso_cg_ms": round(t_cg_an * 1e3, 1),
                "aniso_cg_iters": r_an.iterations,
                "aniso_amg_setup_s": round(t_setup_an, 1),
                "aniso_amg_pcg_ms": round(t_amg_an * 1e3, 1),
                "aniso_amg_pcg_iters": int(it_an),
                "aniso_amg_pcg_converged": bool(int(info_an) == 0),
                "aniso_amg_wall_speedup_vs_cg": round(
                    t_cg_an / t_amg_an, 2),
            })
            del Aan, ban, Man
        except Exception as e:  # pragma: no cover
            extra["amg_aniso_error"] = str(e)[:120]

        del Abig, bb, xg

        # --- nonsymmetric at scale: BiCGStab on the 27-pt
        # convection-diffusion system through the router fast path ---
        _progress("bicgstab 110M")
        try:
            from tpu_sparse.solvers import bicgstab_full

            Acd = generators.convection_diffusion_3d_27pt(
                160, dtype=np.float32)
            bcd = Acd @ xb
            gbi = jax.jit(lambda a, rhs: bicgstab_full(
                a, rhs, tol=1e-6, maxiter=500))
            t_biw = wall_time(gbi, Acd, bcd, warmup=1, iters=3)
            _, inf_w, it_w, _ = gbi(Acd, bcd)
            bi_best, bi_it, bi_info, bi_kernel = (
                t_biw, int(it_w), inf_w, "while_loop")
            extra["bicgstab_110M_while_ms"] = round(t_biw * 1e3, 1)
            try:
                from tpu_sparse.kernels.pallas_bicgstab import (
                    fused_bicgstab_ext, make_fused_bicgstab_operator)
                from tpu_sparse.kernels.pallas_cg import pick_block_iters

                opb = make_fused_bicgstab_operator(Acd)
                if opb is not None:
                    def _fbi(K):
                        return jax.jit(lambda o, rhs: fused_bicgstab_ext(
                            o, rhs, tol=1e-6, maxiter=500,
                            block_iters=K))

                    _, _, it_f0, _ = jax.block_until_ready(
                        _fbi(12)(opb, bcd))
                    Kt = pick_block_iters(int(it_f0))
                    gfb = _fbi(Kt)
                    t_bif = wall_time(lambda: gfb(opb, bcd), warmup=1,
                                      iters=3)
                    xfb, inf_f, it_f, _ = gfb(opb, bcd)
                    true_rel = float(jnp.linalg.norm(bcd - Acd @ xfb)
                                     / jnp.linalg.norm(bcd))
                    extra.update({
                        "bicgstab_110M_fused_ms": round(t_bif * 1e3, 1),
                        "bicgstab_110M_fused_true_rel_res": true_rel,
                    })
                    if int(inf_f) == 0 and true_rel <= 2e-6 \
                            and t_bif < bi_best:
                        bi_best, bi_it, bi_info, bi_kernel = (
                            t_bif, int(it_f), inf_f, "fused_pallas")
            except Exception as e:
                extra["bicgstab_110M_fused_error"] = str(e)[:120]
            extra.update({
                "bicgstab_110M_nnz": int(Acd.nnz),
                "bicgstab_110M_ms": round(bi_best * 1e3, 1),
                "bicgstab_110M_iters": bi_it,
                "bicgstab_110M_kernel": bi_kernel,
                "bicgstab_110M_converged": bool(int(bi_info) == 0),
            })

            # GMRES completes the at-scale Krylov trio. The restart-cycle
            # cost is orthogonalization traffic against the stored basis
            # (not fusable into the SpMV stream); r5 cut it with blocked
            # prefix projections + the reference's conditional second
            # CGS pass (krylov._iterative_classical_gram_schmidt)
            _progress("gmres 110M")
            from tpu_sparse.solvers import gmres_full

            ggm = jax.jit(lambda a, rhs: gmres_full(
                a, rhs, tol=1e-6, restart=20, maxiter=500))
            t_gm = wall_time(ggm, Acd, bcd, warmup=1, iters=3)
            _, inf_g, it_g, _ = ggm(Acd, bcd)
            extra.update({
                "gmres_110M_ms": round(t_gm * 1e3, 1),
                "gmres_110M_restarts": int(it_g),
                "gmres_110M_converged": bool(int(inf_g) == 0),
            })
            del Acd, bcd
        except Exception as e:  # pragma: no cover
            extra["bicgstab_110M_error"] = str(e)[:120]
        del xb
    except Exception as e:  # pragma: no cover
        extra["cg_110M_error"] = str(e)[:120]

    _progress("f64 spmv")
    # --- f64 SpMV (reference defaults to fp64 —
    # torch_sparse_linalg.py:57-58). Primary path: the double-f32
    # compensated Pallas kernel (ExtendedStencilOperatorDF, ~2^-45
    # accuracy, verified 4.6e-15 vs the f64 oracle on chip); the
    # XLA-emulated number is reported alongside for comparison ---
    try:
        jax.config.update("jax_enable_x64", True)
        A64 = generators.poisson3d_27pt(64, dtype=np.float64)
        v64 = jnp.asarray(rng.standard_normal(A64.shape[0]))
        s64 = np.float64(1.0 / 27.0)
        from tpu_sparse.kernels.pallas_spmv import make_extended_operator_f64

        op64 = make_extended_operator_f64(A64)
        if op64 is not None:
            ve64 = op64.extend(v64)
            # time the kernel on extended pairs (hi/lo f32), like the
            # f32 headline times the extended operator. n=64^3 is a
            # ~100 us op: long chains so the slope clears dispatch
            # jitter, plus the implied GB/s as a roofline sanity bound
            # (hi+lo pairs move 8 B per nnz).
            s32 = np.float32(1.0 / 27.0)
            dtdf = per_iter_time(lambda y: op64(y) * s32, ve64,
                                 K1=10, K2=110)
            df_bw = (A64.nnz * 8 + 3 * A64.shape[0] * 8) / dtdf / 1e9
            extra.update({
                "spmv_f64_df32_gnnz_per_s": round(A64.nnz / dtdf / 1e9, 2),
                "spmv_f64_df32_gbs": round(df_bw, 1),
            })
        from tpu_sparse.kernels import reference as _kref

        # long chains: the ~0.3 ms/op XLA row needs the K2-K1 delta well
        # clear of dispatch jitter (a short-chain reading captured 43
        # Gnnz/s once in r4 where long chains consistently give 18-21)
        dt64 = per_iter_time(lambda y: _kref.dia_spmv(A64, y) * s64, v64,
                             K1=10, K2=110)
        extra.update({
            "spmv_f64_xla_gnnz_per_s": round(A64.nnz / dt64 / 1e9, 2),
            "spmv_f64_n": int(A64.shape[0]),
        })

        # router-integrated default-f64 comparison (VERDICT r3 weak #3 /
        # next-round #2): the EXACT programs SparseSolver dispatches for
        # solve(A_f64, b_f64) — DF fast path vs the XLA-f64 path — timed
        # as per-iteration slopes between two fixed-iteration solves
        # (tol far below reach, so maxiter iterations run; dispatch and
        # setup cancel in the slope)
        try:
            from tpu_sparse.api.solver import (_jitted_krylov,
                                               _jitted_krylov_f64df)

            b64 = A64 @ v64

            def _per_iter_solver(build):
                ts = []
                for mi in (20, 120):
                    f = build(mi)
                    ts.append(wall_time(lambda: f(A64, b64, None, None),
                                        warmup=1, iters=3))
                return max((ts[1] - ts[0]) / 100, 1e-9)

            dt_df = _per_iter_solver(lambda mi: _jitted_krylov_f64df(
                "cg", 1e-30, 0.0, mi, 20, "batched"))
            dt_xla = _per_iter_solver(lambda mi: _jitted_krylov(
                "cg", 1e-30, 0.0, mi, 20, "batched", False))
            extra.update({
                "router_f64_df_us_per_iter": round(dt_df * 1e6, 1),
                "router_f64_xla_us_per_iter": round(dt_xla * 1e6, 1),
                "router_f64_spmv_speedup_vs_xla": round(dt_xla / dt_df, 2),
            })

            # what solve(A_f64, b_f64) actually does by default now:
            # precision='auto' → defect-correction mixed (f32 inner +
            # DF-f64 outer residuals), versus the old full-XLA f64 loop
            from tpu_sparse.api.solver import SparseSolver as _SS

            s64 = _SS()
            t_auto = wall_time(
                lambda: s64.solve(A64, b64, method="cg", tol=1e-8,
                                  maxiter=3000)[0], warmup=1, iters=3)
            x_a, r_a = s64.solve(A64, b64, method="cg", tol=1e-8,
                                 maxiter=3000)
            t_fullx = wall_time(
                lambda: s64.solve(A64, b64, method="cg", tol=1e-8,
                                  maxiter=3000, precision="full")[0],
                warmup=1, iters=3)
            extra.update({
                "router_f64_auto_ms": round(t_auto * 1e3, 1),
                "router_f64_auto_converged": bool(r_a.converged),
                "router_f64_auto_rel_res": float(r_a.residual),
                "router_f64_full_ms": round(t_fullx * 1e3, 1),
                "router_f64_auto_speedup_vs_full": round(
                    t_fullx / t_auto, 2),
            })
        except Exception as e:  # pragma: no cover
            extra["router_f64_error"] = str(e)[:120]
        del A64, v64
    except Exception as e:  # pragma: no cover
        extra["spmv_f64_error"] = str(e)[:120]
    finally:
        jax.config.update("jax_enable_x64", False)

    _progress("ldc e2e")
    # --- end-to-end application: lid-driven-cavity CFD (the reference's
    # own e2e demo, SURVEY.md §3.5). Whole-step jit + scan chunking;
    # steps/s is the honest app-level number (includes momentum, BCs,
    # pressure CG, correction) ---
    try:
        if _past_deadline(extra, "ldc"):
            raise TimeoutError("soft deadline")
        import sys as _sys

        _sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "examples", "ldc"))
        from ldc_solver import LDCConfig, LDCSolver

        jax.config.update("jax_enable_x64", True)
        sim = LDCSolver(LDCConfig(nx=64, Re=100.0, solver="cg",
                                  precond="jacobi", tol=1e-8))
        sim.run(20, chunk=20)  # warmup/compile
        out_ldc = sim.run(100, chunk=100)
        extra.update({
            "ldc_nx": 64,
            "ldc_steps_per_s": round(out_ldc["steps_per_s"], 1),
            "ldc_mass_residual": out_ldc["mass_residual"],
        })
        # reference-default size (origin script: nx=100, Re=400,
        # dt=0.01 — fields cross-validated to ~2.5e-06 relative against
        # /root/reference/FVM_example/LDC_by_scipy on CPU, r5;
        # examples/ldc/validate_reference.py)
        sim2 = LDCSolver(LDCConfig(nx=100, Re=400.0, solver="cg",
                                   precond="jacobi", tol=1e-8, dt=0.01))
        sim2.run(20, chunk=20)
        out_ldc2 = sim2.run(100, chunk=100)
        extra.update({
            "ldc_ref_nx100_steps_per_s": round(
                out_ldc2["steps_per_s"], 1),
            "ldc_ref_nx100_mass_residual": out_ldc2["mass_residual"],
        })
    except Exception as e:  # pragma: no cover
        extra["ldc_error"] = str(e)[:120]
    finally:
        jax.config.update("jax_enable_x64", False)

    _progress("weak scaling")
    # --- weak-scaling sweep on the virtual CPU mesh (subprocess: the
    # device count must be fixed before backend init). On one host this
    # validates collective mechanics/communication volume, not hardware
    # scaling — this machine has 4 cores serving all 8 virtual devices ---
    try:
        if _past_deadline(extra, "weak_scaling"):
            raise TimeoutError("soft deadline")
        import subprocess
        import sys

        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
        proc = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_tools", "scaling.py"),
             "--cpu", "--devices", "1", "2", "4", "8",
             "--nx-per-device", "32"],
            capture_output=True, text=True, timeout=900, env=env)
        rows = []
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        if rows:
            # wall-clock rates on the shared-core virtual mesh validate
            # mechanics only — deliberately NOT reported as "efficiency".
            # Slope timings on the loaded 4-core host occasionally go
            # non-positive (two chained runs land on identical wall
            # times); report those as null rather than absurd rates.
            extra["weak_scaling_mechanics_cpu_sim"] = [
                {"devices": r["devices"],
                 "gnnz_per_s": (r["gnnz_per_s"]
                                if 0 < r["gnnz_per_s"] < 1e3 else None)}
                for r in rows]
            extra["weak_scaling_mechanics_note"] = (
                "virtual 8-device mesh on a 4-core host; wall rates "
                "validate halo-exchange mechanics, not scaling — see "
                "weak_scaling_comm_model for the measured-volume model")
        elif proc.returncode != 0:
            extra["weak_scaling_error"] = (proc.stderr or "")[-160:]

        # measured per-iteration collective volumes (compiled-HLO counts,
        # exact on the CPU mesh) + modeled efficiency at the north-star
        # topology (16 chips / 2 v5e hosts, >100M nnz)
        proc2 = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_tools", "comm_model.py"),
             "--nx", "96", "--target-devices", "16",
             "--mesh-dims", "4", "4",
             "--cwell-gnnz", str(extra.get(
                 "cwell_general_spmv_gnnz_per_s", 39.5))],
            capture_output=True, text=True, timeout=900, env=env)
        for line in proc2.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    extra["weak_scaling_comm_model"] = json.loads(line)
                    break
                except json.JSONDecodeError:
                    pass
        if ("weak_scaling_comm_model" not in extra
                and proc2.returncode != 0):
            extra["weak_scaling_comm_model_error"] = (
                proc2.stderr or "")[-160:]
    except Exception as e:  # pragma: no cover
        extra["weak_scaling_error"] = str(e)[:120]

    out = {
        "metric": "spmv_27pt_poisson3d_gnnz_per_s",
        "value": round(gnnz, 2) if gnnz is not None else None,
        "unit": "Gnnz/s",
        "vs_baseline": round(frac_sol, 3) if frac_sol is not None else None,
        "extra": extra,
    }

    # Artifact protocol (VERDICT r3 weak #1): the driver captures only the
    # LAST ~2000 chars of stdout, so the full dump goes to a file (and
    # stderr for the log) while the final stdout line is a COMPACT summary
    # holding the headline + the round's key rows.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full.json")
    try:
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out), file=sys.stderr, flush=True)
    except Exception:  # pragma: no cover
        pass

    _KEY_ROWS = (
        "backend", "spmv_27pt_kernel", "spmv_27pt_us", "spmv_27pt_gbs",
        "spmv_27pt_frac_of_measured_hbm", "hbm_triad_gbs_measured",
        "spmv_27pt_failed",
        "cg_tridiag500_wall_ms", "cg_tridiag500_vs_rtx4090",
        "gmres_tridiag500_wall_ms", "gmres_tridiag500_vs_rtx4090",
        "direct_tridiag500_wall_ms", "direct_tridiag500_vs_rtx4090",
        "cg_110M_ms", "cg_110M_iters", "cg_110M_converged",
        "cg_110M_gnnz_per_s_effective", "cg_110M_kernel",
        "amg_pcg_110M_ms", "amg_pcg_110M_iters", "amg_pcg_110M_converged",
        "bicgstab_110M_ms", "bicgstab_110M_kernel",
        "bicgstab_110M_converged",
        "gmres_110M_ms", "gmres_110M_converged",
        "aniso_cg_ms", "aniso_amg_pcg_ms", "aniso_amg_pcg_converged",
        "aniso_amg_wall_speedup_vs_cg", "aniso_amg_setup_s",
        "general_direct_n", "general_direct_setup_s",
        "general_direct_repeat_ms", "general_direct_kernel",
        "general_direct_converged",
        "cg_110M_router_ext_ms",
        "spmv_f64_df32_gnnz_per_s", "router_f64_spmv_speedup_vs_xla",
        "router_f64_auto_ms", "router_f64_auto_speedup_vs_full",
        "cwell_general_spmv_gnnz_per_s",
        "ldc_steps_per_s", "ldc_mass_residual",
        "ldc_ref_nx100_steps_per_s",
    )
    compact = dict(out)
    compact["extra"] = {k: extra[k] for k in _KEY_ROWS if k in extra}
    compact["extra"]["errors"] = sorted(
        k for k in extra if k.endswith("_error"))[:6]
    compact["full_detail"] = "bench_full.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
