#!/usr/bin/env python3
"""Follow-up on-chip session (round 2): transposed-B SpMM validation +
the measurements the first session crashed before reaching.

    python bench_tools/tpu_session2.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import per_iter_time, wall_time  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    from tpu_sparse.kernels import reference as kref
    from tpu_sparse.kernels.pallas_cwell import (cwell_spmm_pallas,
                                                 cwell_spmv_pallas)
    from tpu_sparse.sparse import generators
    from tpu_sparse.sparse.convert import to_csr
    from tpu_sparse.sparse.cwell import csr_to_cwell

    rng = np.random.default_rng(0)
    scale = np.float32(1 / 27)
    cpu0 = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    csr27 = to_csr(generators.poisson3d_27pt(64, dtype=np.float32))
    with jax.default_device(cpu0):
        W = csr_to_cwell(csr27)
    W = jax.device_put(W, dev)
    v = jnp.asarray(rng.standard_normal(W.shape[0]).astype(np.float32))

    # 1) transposed-B SpMM: correctness on chip + k sweep (k=8 OOM'd the
    # old resident (m, kt) layout at m=262144)
    for k in (8, 32, 128):
        B = jnp.asarray(rng.standard_normal((W.shape[1], k)).astype(
            np.float32))
        try:
            Y = cwell_spmm_pallas(W, B)
            if Y is None:
                print(f"spmm k={k}: kernel unavailable", flush=True)
                continue
            Yo = kref.cwell_spmm(W, B)
            rel = float(jnp.max(jnp.abs(Y - Yo))
                        / (float(jnp.max(jnp.abs(Yo))) + 1e-30))
            dt = per_iter_time(lambda y: cwell_spmm_pallas(W, y) * scale,
                               B, K1=2, K2=10)
            print(f"spmm k={k}: {W.nnz * k / dt / 1e9:.1f} Gnnz/s "
                  f"({dt*1e6:.0f} us, rel {rel:.1e})", flush=True)
            if k == 32:
                dtx = per_iter_time(
                    lambda y: kref.cwell_spmm(W, y) * scale, B, K1=1, K2=3)
                print(f"spmm k=32 XLA: {W.nnz*32/dtx/1e9:.2f} Gnnz/s "
                      f"-> pallas speedup {dtx/dt:.1f}x", flush=True)
        except Exception as e:
            print(f"spmm k={k} FAILED: {str(e)[:300]}", flush=True)

    # 2) grouped SpMM Q sweep (merged one-hots -> Q-fold fewer matmuls)
    for q in (2, 4, 8):
        with jax.default_device(cpu0):
            Wq = csr_to_cwell(csr27, group=q)
        Wq = jax.device_put(Wq, dev)
        for k in (32,):
            B = jnp.asarray(rng.standard_normal((Wq.shape[1], k)).astype(
                np.float32))
            try:
                Y = cwell_spmm_pallas(Wq, B)
                if Y is None:
                    print(f"spmm Q={q} k={k}: unavailable", flush=True)
                    continue
                dt = per_iter_time(
                    lambda y: cwell_spmm_pallas(Wq, y) * scale, B,
                    K1=2, K2=10)
                print(f"spmm Q={q} k={k}: "
                      f"{Wq.nnz * k / dt / 1e9:.1f} Gnnz/s", flush=True)
            except Exception as e:
                print(f"spmm Q={q} k={k} FAILED: {str(e)[:200]}",
                      flush=True)

    # 3) rand-matrix CWELL SpMV Q sweep, big enough to time reliably:
    # n=16384, 1% density -> ~2.7M nnz (first session's n=4096 pack was
    # ~3 us/apply and the two-point slope went negative on chip noise)
    from tpu_sparse.sparse.convert import dense_to_csr
    nrand = 16384
    Ad = ((rng.random((nrand, nrand)) < 0.01)
          * rng.standard_normal((nrand, nrand))).astype(np.float32)
    Ar = dense_to_csr(Ad)
    vr = jnp.asarray(rng.standard_normal(nrand).astype(np.float32))
    for q in (1, 2, 4):
        with jax.default_device(cpu0):
            Wq = csr_to_cwell(Ar, group=q)
        Wq = jax.device_put(Wq, dev)
        try:
            if cwell_spmv_pallas(Wq, vr) is None:
                print(f"cwell rand16k Q={q}: unavailable", flush=True)
                continue
            dt = per_iter_time(
                lambda z: cwell_spmv_pallas(Wq, z) * scale, vr,
                K1=10, K2=100)
            print(f"cwell rand16k Q={q} (S={Wq.planes}, "
                  f"fill={Wq.fill:.2f}): {Wq.nnz/dt/1e9:.1f} Gnnz/s",
                  flush=True)
        except Exception as e:
            print(f"cwell rand16k Q={q} FAILED: {str(e)[:200]}",
                  flush=True)
    del Ad, Ar

    # 3b) 27-pt CWELL SpMV Q sweep with the longer timing chains
    for q in (1, 2, 4):
        with jax.default_device(cpu0):
            Wq = csr_to_cwell(csr27, group=q)
        Wq = jax.device_put(Wq, dev)
        try:
            dt = per_iter_time(
                lambda z: cwell_spmv_pallas(Wq, z) * scale, v,
                K1=10, K2=50)
            print(f"cwell 27pt Q={q} (S={Wq.planes}, fill={Wq.fill:.2f}):"
                  f" {Wq.nnz/dt/1e9:.1f} Gnnz/s", flush=True)
        except Exception as e:
            print(f"cwell 27pt Q={q} FAILED: {str(e)[:200]}", flush=True)

    # 4) bf16 CWELL SpMV
    try:
        Wb = W.with_data(W.vals.astype(jnp.bfloat16))
        if cwell_spmv_pallas(Wb, v) is not None:
            dtb = per_iter_time(
                lambda z: cwell_spmv_pallas(Wb, z).astype(jnp.float32)
                * scale, v, K1=10, K2=50)
            print(f"cwell bf16: {W.nnz/dtb/1e9:.1f} Gnnz/s", flush=True)
    except Exception as e:
        print(f"cwell bf16 FAILED: {str(e)[:200]}", flush=True)

    # 5) block CG vs batch CG on chip
    try:
        from tpu_sparse.solvers import batch_cg, block_cg

        A = generators.poisson2d(96, dtype=np.float32)
        Bb = jnp.asarray(rng.standard_normal((A.shape[0], 8)).astype(
            np.float32))
        fblk = jax.jit(lambda a, bb: block_cg(a, bb, tol=1e-5,
                                              maxiter=2000))
        fbat = jax.jit(lambda a, bb: batch_cg(a, bb, tol=1e-5,
                                              maxiter=2000))
        t1 = wall_time(fblk, A, Bb, warmup=1, iters=3)
        t2 = wall_time(fbat, A, Bb, warmup=1, iters=3)
        X, inf, it, _ = fblk(A, Bb)
        print(f"block_cg 8rhs: {t1*1e3:.1f} ms ({int(it)} iters, "
              f"conv={bool(int(jnp.all(inf == 0)))}) vs batch "
              f"{t2*1e3:.1f} ms -> {t2/t1:.2f}x", flush=True)
    except Exception as e:
        print(f"block_cg FAILED: {str(e)[:200]}", flush=True)

    # 6) block PCR vs banded LU scan (f64)
    try:
        from tpu_sparse.direct import banded_lu_solve, block_pcr_solve

        jax.config.update("jax_enable_x64", True)
        Aw = generators.poisson2d(128)
        bw = Aw @ jnp.ones(Aw.shape[0])
        fp = jax.jit(lambda a, r: block_pcr_solve(a, r))
        fl = jax.jit(lambda a, r: banded_lu_solve(a, r))
        tp = wall_time(fp, Aw, bw, warmup=1, iters=3)
        tl = wall_time(fl, Aw, bw, warmup=1, iters=3)
        xp = fp(Aw, bw)
        rel = float(jnp.linalg.norm(bw - Aw @ xp) / jnp.linalg.norm(bw))
        print(f"block_pcr n=16384 w=128: {tp*1e3:.1f} ms (rel {rel:.1e}) "
              f"vs banded LU scan {tl*1e3:.1f} ms -> {tl/tp:.1f}x",
              flush=True)
    except Exception as e:
        print(f"block_pcr FAILED: {str(e)[:200]}", flush=True)
    finally:
        jax.config.update("jax_enable_x64", False)

    # 7) resident C=64K default confirm at the bench size
    try:
        from tpu_sparse.kernels import pallas_spmv as ps

        A3 = generators.poisson3d_27pt(128, dtype=np.float32)
        v3 = jnp.asarray(rng.standard_normal(A3.shape[0]).astype(
            np.float32))
        op = ps.ExtendedStencilOperator(A3, resident=True)
        ve = op.extend(v3)
        dt = per_iter_time(lambda y: op(y) * scale, ve)
        bw_gbs = (A3.nnz * 4 + 3 * A3.shape[0] * 4) / dt / 1e9
        print(f"ext resident default C={op.C}: {A3.nnz/dt/1e9:.1f} Gnnz/s"
              f" ({bw_gbs:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"ext resident default FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
