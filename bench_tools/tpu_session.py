#!/usr/bin/env python3
"""One-shot on-chip session: validation runner + kernel spot measurements
for the round-2 additions. Run when the TPU tunnel is up:

    python bench_tools/tpu_session.py

Prints one labelled line per measurement (not the driver bench format —
that stays bench.py)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import per_iter_time, wall_time  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    from tpu_sparse.sparse import generators
    from tpu_sparse.sparse.convert import to_csr
    from tpu_sparse.sparse.cwell import csr_to_cwell

    rng = np.random.default_rng(0)
    scale = np.float32(1 / 27)

    # CWELL pack on host CPU, then ship
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        W = csr_to_cwell(to_csr(generators.poisson3d_27pt(
            64, dtype=np.float32)))
    W = jax.device_put(W, jax.devices()[0])
    v = jnp.asarray(rng.standard_normal(W.shape[0]).astype(np.float32))

    # 0) x-resident vs DMA-windowed extended DIA kernel A/B (the headline)
    from tpu_sparse.kernels import pallas_spmv as ps
    from tpu_sparse.kernels import reference as kref

    for nx in (128, 160):
        A3 = generators.poisson3d_27pt(nx, dtype=np.float32)
        v3 = jnp.asarray(rng.standard_normal(A3.shape[0]).astype(
            np.float32))
        for label, kw in (("resident", dict(resident=True)),
                          ("windowed", dict(resident=False))):
            try:
                op = ps.ExtendedStencilOperator(A3, **kw)
                ve = op.extend(v3)
                dt = per_iter_time(lambda y: op(y) * scale, ve)
                bw_gbs = (A3.nnz * 4 + 3 * A3.shape[0] * 4) / dt / 1e9
                print(f"ext {label} n={nx}^3 (C={op.C}): "
                      f"{A3.nnz/dt/1e9:.1f} Gnnz/s ({bw_gbs:.0f} GB/s)",
                      flush=True)
            except Exception as e:
                print(f"ext {label} n={nx}^3 FAILED: {str(e)[:200]}",
                      flush=True)
        # resident chunk sweep at the bench size
        if nx == 128:
            for c in (16, 32, 64, 128):
                try:
                    op = ps.ExtendedStencilOperator(A3, chunk=c * 1024,
                                                    resident=True)
                    if not op.resident:
                        print(f"ext resident C={c}K: over cap", flush=True)
                        continue
                    ve = op.extend(v3)
                    dt = per_iter_time(lambda y: op(y) * scale, ve)
                    print(f"ext resident C={c}K: "
                          f"{A3.nnz/dt/1e9:.1f} Gnnz/s", flush=True)
                except Exception as e:
                    print(f"ext resident C={c}K FAILED: {str(e)[:120]}",
                          flush=True)
        del A3, v3

    # 0b) DF (f64 double-f32) resident vs windowed
    jax.config.update("jax_enable_x64", True)
    A64 = generators.poisson3d_27pt(64)
    v64 = jnp.asarray(rng.standard_normal(A64.shape[0]))
    for label, kw in (("resident", dict(resident=True)),
                      ("windowed", dict(resident=False))):
        try:
            op64 = ps.ExtendedStencilOperatorDF(A64, **kw)
            ve64 = op64.extend(v64)
            dt = per_iter_time(lambda y: op64(y) * scale, ve64)
            print(f"ext DF {label} n=64^3 (C={op64.C}): "
                  f"{A64.nnz/dt/1e9:.1f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"ext DF {label} FAILED: {str(e)[:200]}", flush=True)
    # accuracy spot check for the resident DF path on chip
    try:
        opr = ps.ExtendedStencilOperatorDF(A64, resident=True)
        y = opr.matvec64(v64)
        yo = kref.dia_spmv(A64, v64)
        rel = float(jnp.max(jnp.abs(y - yo))
                    / jnp.max(jnp.abs(yo)))
        print(f"ext DF resident rel err vs f64 oracle: {rel:.2e}",
              flush=True)
    except Exception as e:
        print(f"ext DF resident accuracy FAILED: {str(e)[:200]}",
              flush=True)
    jax.config.update("jax_enable_x64", False)
    del A64, v64

    # 0c) grouped-plane CWELL quantum sweep (ROADMAP perf item 2):
    # Q-plane runs share a window row -> 2*(8/Q) dynamic x-row reads per
    # 8-plane group instead of 16, at S_Q/S_1 plane inflation.
    from tpu_sparse.kernels.pallas_cwell import (cwell_spmm_pallas,
                                                 cwell_spmv_pallas)

    def _bench_cwell(Wq, tag):
        if cwell_spmv_pallas(Wq, v) is None:
            print(f"cwell {tag}: kernel unavailable", flush=True)
            return
        dt = per_iter_time(lambda z: cwell_spmv_pallas(Wq, z) * scale, v)
        print(f"cwell {tag} (S={Wq.planes}, fill={Wq.fill:.2f}): "
              f"{Wq.nnz/dt/1e9:.1f} Gnnz/s", flush=True)

    _bench_cwell(W, "Q=1 27pt")
    csr27 = to_csr(generators.poisson3d_27pt(64, dtype=np.float32))
    for q in (2, 4, 8):
        with jax.default_device(cpu0):
            Wq = csr_to_cwell(csr27, group=q)
        try:
            _bench_cwell(jax.device_put(Wq, jax.devices()[0]),
                         f"Q={q} 27pt")
        except Exception as e:
            print(f"cwell Q={q} FAILED: {str(e)[:200]}", flush=True)
    del csr27
    # unstructured case: random 1% (lower fill, inflation milder)
    from tpu_sparse.sparse.convert import dense_to_csr
    nrand = 4096
    Ad = ((rng.random((nrand, nrand)) < 0.01)
          * rng.standard_normal((nrand, nrand))).astype(np.float32)
    Ar = dense_to_csr(Ad)
    vr = jnp.asarray(rng.standard_normal(nrand).astype(np.float32))
    for q in (1, 2, 4):
        with jax.default_device(cpu0):
            Wq = csr_to_cwell(Ar, group=q)
        Wq = jax.device_put(Wq, jax.devices()[0])
        try:
            if cwell_spmv_pallas(Wq, vr) is None:
                print(f"cwell rand Q={q}: unavailable", flush=True)
                continue
            dt = per_iter_time(
                lambda z: cwell_spmv_pallas(Wq, z) * scale, vr)
            print(f"cwell rand Q={q} (S={Wq.planes}, fill={Wq.fill:.2f}):"
                  f" {Wq.nnz/dt/1e9:.1f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"cwell rand Q={q} FAILED: {str(e)[:200]}", flush=True)
    del Ad, Ar, vr

    # 1) SpMM sweep over kt/rb

    for k in (8, 32, 128):
        B = jnp.asarray(rng.standard_normal((W.shape[1], k)).astype(
            np.float32))
        if cwell_spmm_pallas(W, B) is None:
            print(f"spmm k={k}: kernel unavailable", flush=True)
            continue
        dt = per_iter_time(lambda y: cwell_spmm_pallas(W, y) * scale, B,
                           K1=2, K2=10)
        print(f"spmm k={k}: {W.nnz * k / dt / 1e9:.1f} Gnnz/s "
              f"({dt*1e6:.0f} us)", flush=True)
        if k == 32:
            dtx = per_iter_time(lambda y: kref.cwell_spmm(W, y) * scale,
                                B, K1=1, K2=3)
            print(f"spmm k=32 XLA: {W.nnz * 32 / dtx / 1e9:.2f} Gnnz/s "
                  f"-> pallas speedup {dtx/dt:.1f}x", flush=True)

    # 1b) grouped SpMM: merged one-hots -> Q-fold fewer MXU matmuls
    # (predicted ~4x at Q=8 on the 27-pt pack despite 1.8x inflation)
    csr27b = to_csr(generators.poisson3d_27pt(64, dtype=np.float32))
    for q in (4, 8):
        with jax.default_device(cpu0):
            Wq = csr_to_cwell(csr27b, group=q)
        Wq = jax.device_put(Wq, jax.devices()[0])
        for k in (32, 128):
            B = jnp.asarray(rng.standard_normal((Wq.shape[1], k)).astype(
                np.float32))
            try:
                if cwell_spmm_pallas(Wq, B) is None:
                    print(f"spmm Q={q} k={k}: unavailable", flush=True)
                    continue
                dt = per_iter_time(
                    lambda y: cwell_spmm_pallas(Wq, y) * scale, B,
                    K1=2, K2=10)
                print(f"spmm Q={q} k={k}: "
                      f"{Wq.nnz * k / dt / 1e9:.1f} Gnnz/s", flush=True)
            except Exception as e:
                print(f"spmm Q={q} k={k} FAILED: {str(e)[:160]}",
                      flush=True)
        # merged one-hot as SpMV (k=1): ungrouped slab-SpMV measured
        # 2.3x slower than gathers; Q-fold merging may flip that
        if q == 8:
            try:
                dt = per_iter_time(
                    lambda z: cwell_spmm_pallas(Wq, z[:, None])[:, 0]
                    * scale, v)
                print(f"spmv-via-spmm Q=8: {Wq.nnz/dt/1e9:.1f} Gnnz/s",
                      flush=True)
            except Exception as e:
                print(f"spmv-via-spmm Q=8 FAILED: {str(e)[:160]}",
                      flush=True)
    del csr27b

    # 2) bf16 CWELL SpMV
    Wb = W.with_data(W.vals.astype(jnp.bfloat16))
    y = cwell_spmv_pallas(Wb, v)
    if y is not None:
        dtb = per_iter_time(
            lambda z: cwell_spmv_pallas(Wb, z).astype(jnp.float32) * scale,
            v)
        dtf = per_iter_time(
            lambda z: cwell_spmv_pallas(W, z) * scale, v)
        print(f"cwell bf16: {W.nnz/dtb/1e9:.1f} Gnnz/s vs f32 "
              f"{W.nnz/dtf/1e9:.1f}", flush=True)

    # 3) block CG vs batch CG on chip
    from tpu_sparse.solvers import batch_cg, block_cg

    A = generators.poisson2d(96, dtype=np.float32)
    Bb = jnp.asarray(rng.standard_normal((A.shape[0], 8)).astype(
        np.float32))
    fblk = jax.jit(lambda a, bb: block_cg(a, bb, tol=1e-5, maxiter=2000))
    fbat = jax.jit(lambda a, bb: batch_cg(a, bb, tol=1e-5, maxiter=2000))
    t1 = wall_time(fblk, A, Bb, warmup=1, iters=3)
    t2 = wall_time(fbat, A, Bb, warmup=1, iters=3)
    X, inf, it, _ = fblk(A, Bb)
    print(f"block_cg 8rhs: {t1*1e3:.1f} ms ({int(it)} iters, "
          f"conv={bool(int(jnp.all(inf == 0)))}) vs batch {t2*1e3:.1f} ms "
          f"-> {t2/t1:.2f}x", flush=True)

    # 4) block PCR vs banded LU scan
    from tpu_sparse.direct import banded_lu_solve, block_pcr_solve

    jax.config.update("jax_enable_x64", True)
    Aw = generators.poisson2d(128)  # n=16384, bandwidth 128, f64
    bw = Aw @ jnp.ones(Aw.shape[0])
    fp = jax.jit(lambda a, r: block_pcr_solve(a, r))
    fl = jax.jit(lambda a, r: banded_lu_solve(a, r))
    tp = wall_time(fp, Aw, bw, warmup=1, iters=3)
    tl = wall_time(fl, Aw, bw, warmup=1, iters=3)
    xp = fp(Aw, bw)
    rel = float(jnp.linalg.norm(bw - Aw @ xp) / jnp.linalg.norm(bw))
    print(f"block_pcr n=16384 w=128: {tp*1e3:.1f} ms (rel {rel:.1e}) vs "
          f"banded LU scan {tl*1e3:.1f} ms -> {tl/tp:.1f}x", flush=True)


if __name__ == "__main__":
    main()
