#!/usr/bin/env python3
"""Round-3 on-chip session: x-resident vs windowed A/B (interleaved),
grouped-CWELL confirmation, SparseLU device/host direct paths, stream
triad. Results recorded in docs/performance.md (round-3 deltas).

    python bench_tools/tpu_session3.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bench import per_iter_time  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    from tpu_sparse.kernels import pallas_spmv as ps
    from tpu_sparse.sparse import generators

    rng = np.random.default_rng(0)
    scale = np.float32(1 / 27)

    # 1) resident vs windowed, interleaved rounds (cancels chip drift).
    #    r3 measured: windowed 141.8-145.8 Gnnz/s, resident 148.0-176.0 —
    #    resident won every round (median +6%).
    A3 = generators.poisson3d_27pt(128, dtype=np.float32)
    v3 = jnp.asarray(rng.standard_normal(A3.shape[0]).astype(np.float32))
    nnz, n = A3.nnz, A3.shape[0]
    ops = {}
    for name, res in (("windowed", False), ("resident", True)):
        op = ps.ExtendedStencilOperator(A3, resident=res)
        ops[name] = (op, op.extend(v3))
    for rnd in range(4):
        for name, (op, ve) in ops.items():
            dt = per_iter_time(lambda y: op(y) * scale, ve)
            print(f"round{rnd} {name}: {nnz/dt/1e9:.1f} Gnnz/s "
                  f"({(nnz*4 + 3*n*4)/dt/1e9:.0f} GB/s 3-vector acct)",
                  flush=True)

    # 2) stream triad (big operand as jit ARGUMENT — closed over it bakes
    #    a 256 MB constant into the remote compile upload, HTTP 413)
    big = jnp.asarray(rng.standard_normal(64 * 1024 * 1024).astype(
        np.float32))
    a_c = np.float32(1.000001)

    def triad_time(K, reps=5):
        g = jax.jit(lambda x, y: jnp.sum(lax.fori_loop(
            0, K, lambda i, z: a_c * z + y, x)))
        float(g(big, big))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(big, big))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = max((triad_time(50) - triad_time(5)) / 45, 1e-9)
    print(f"triad: {3*big.nbytes/dt/1e9:.0f} GB/s", flush=True)
    del big

    # 3) SparseLU general direct through the router: device path at
    #    n=16384 (Pallas-capable factors), cached host path at n=65536
    import scipy.sparse as sp

    from tpu_sparse.api.solver import SparseSolver
    from tpu_sparse.sparse.convert import csr_from_arrays, to_csr

    s = SparseSolver()
    for grid in (128, 256):
        A = to_csr(generators.poisson2d(grid, dtype=np.float32))
        nn = A.shape[0]
        Asp = sp.csr_matrix((np.asarray(A.data), np.asarray(A.indices),
                             np.asarray(A.indptr)), shape=A.shape)
        Asp = (Asp + 0.1 * sp.triu(Asp, k=1)).tocsr().astype(np.float32)
        Ac = csr_from_arrays(Asp.data, Asp.indices, Asp.indptr, Asp.shape)
        xt = rng.standard_normal(nn).astype(np.float32)
        b = jnp.asarray((Asp @ xt).astype(np.float32))
        t0 = time.time()
        x, r = s.solve(Ac, b, method="direct")
        t1 = time.time() - t0
        t0 = time.time()
        x, r = s.solve(Ac, b, method="direct")
        print(f"general direct n={nn}: conv={r.converged} "
              f"rel={r.residual:.1e} first={t1:.1f}s "
              f"repeat={(time.time()-t0)*1e3:.0f}ms", flush=True)

    # 4) grouped CWELL (AUTO_GROUP=2 default) SpMV + SpMM incl. wide k
    from tpu_sparse.kernels import reference as kref
    from tpu_sparse.kernels.pallas_cwell import (cwell_spmm_pallas,
                                                 cwell_spmv_pallas)
    from tpu_sparse.sparse.cwell import AUTO_GROUP, csr_to_cwell

    cpu0 = jax.devices("cpu")[0]
    csr27 = to_csr(generators.poisson3d_27pt(64, dtype=np.float32))
    with jax.default_device(cpu0):
        W = csr_to_cwell(csr27, group=AUTO_GROUP)
    W = jax.device_put(W, jax.devices()[0])
    v = jnp.asarray(rng.standard_normal(W.shape[0]).astype(np.float32))
    dt = per_iter_time(lambda z: cwell_spmv_pallas(W, z) * scale, v,
                       K1=10, K2=50)
    print(f"cwell spmv Q={AUTO_GROUP}: {W.nnz/dt/1e9:.1f} Gnnz/s",
          flush=True)
    for k in (32, 128):
        B = jnp.asarray(rng.standard_normal((W.shape[1], k)).astype(
            np.float32))
        Y = cwell_spmm_pallas(W, B)
        Yo = kref.cwell_spmm(W, B)
        rel = float(jnp.max(jnp.abs(Y - Yo))
                    / (float(jnp.max(jnp.abs(Yo))) + 1e-30))
        dt = per_iter_time(lambda y: cwell_spmm_pallas(W, y) * scale, B,
                           K1=2, K2=10)
        print(f"spmm Q={AUTO_GROUP} k={k}: {W.nnz*k/dt/1e9:.1f} Gnnz/s "
              f"(rel {rel:.1e})", flush=True)


if __name__ == "__main__":
    main()
