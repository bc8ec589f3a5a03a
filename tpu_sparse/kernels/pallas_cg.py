"""Fused whole-CG-iteration Pallas kernel (extended-space stencil CG).

Motivation (r3 measurement, docs/performance.md): the 110M-nnz 27-pt CG
runs 1332 us/iteration while its HBM bound is ~950 us — the SpMV kernel
streams at the roofline but every dot/axpy is a separate XLA pass over
16 MB vectors, plus reduction sync latency. When the extended vectors
fit VMEM (E ≤ ~4.3M f32 for four live vectors), the whole CG iteration
can run inside ONE Pallas kernel:

  * x, r, p live in VMEM across iterations (aliased in/out, so a launch
    resumes exactly where the previous one stopped — no restart, no
    conjugacy loss); Ap is kernel scratch.
  * per iteration the ONLY HBM traffic is the streamed diagonal data
    (the same pipelined blocks as the x-resident SpMV kernel) — dots and
    axpys become VMEM sweeps at VPU bandwidth.
  * grid = (K iterations, E/C chunks); the chunk pass computes Ap and
    accumulates <p, Ap>; the last chunk of each iteration runs the
    epilogue (alpha, x/r update, <r,r>, beta, p update) as chunked VMEM
    loops.

alpha/beta are guarded so a converged system makes further iterations
identity (alpha = 0), which lets the outer loop run fixed-K launches
without breakdown. The per-iteration ||r||^2 history implements the
usual ``||r|| <= max(tol*||b||, atol)`` contract outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from tpu_sparse.kernels.pallas_spmv import ExtendedStencilOperator

_INTERPRET = False

# four E-length f32 vectors (x, r, p outputs + Ap scratch) plus
# streamed data blocks must fit the 128 MB vmem budget
_FUSED_E_CAP = 4 * 1024 * 1024 + 256 * 1024


def _dia_cg_kernel(*refs, offsets, H, C, lo_chunks, hi_chunk, nblocks, K,
                   has_m=False):
    """One grid step = (iteration i, INTERIOR chunk j ∈ [0, nblocks)).

    has_m=True adds a VMEM-resident diagonal-preconditioner input
    dinv_ref (unit margins): the recurrences switch to Jacobi-PCG —
    γ = ⟨r, D⁻¹r⟩ drives α/β while the ‖r‖² history keeps the
    unpreconditioned stopping contract (cg_full parity: its loop also
    stops on ⟨r,r⟩ under M). z is never stored: D⁻¹r folds into the
    same epilogue sweeps.

    The grid walks interior chunks only (absolute chunk jc = j +
    lo_chunks): margin chunks of x/r/p are zero on entry and never
    updated, and Ap margins are zeroed once at init, so the per-iteration
    margin passes of the r3 layout are gone (~2/42 of grid steps at the
    110M-nnz size). Window reads stay in bounds without clamping because
    Wl ≥ H (both round w up, Wl to the coarser C grid).

    xi/ri/pi are the incoming state in HBM (memory_space=ANY): on real
    TPU an output VMEM buffer is NOT pre-loaded with aliased input
    contents (only interpret mode behaves as if it were — measured r3:
    the aliased variant diverged on chip), so step (0,0) DMAs the state
    into the output refs explicitly, and every later read/write goes
    through the output refs x/r/p. data_ref is the (ndiag, C) streamed
    block; rr_ref is the (K, 128) ||r||^2 history output (written with
    static row stores on the final step — Mosaic rejects rank-1 blocks
    under 128 and dynamic VMEM scalar stores; the running history lives
    in SMEM, where dynamic indexing is legal); ap_ref is (E,) scratch;
    sm_ref is (1, 2 + K) SMEM [γ, pAp, rr-hist...] (γ = ⟨r,r⟩ when
    has_m=False); sems: 3 DMA semaphores for the state load."""
    if has_m:
        (xi_ref, ri_ref, pi_ref, dinv_ref, data_ref, x_ref, r_ref, p_ref,
         rr_ref, ap_ref, sm_ref, sems) = refs
    else:
        (xi_ref, ri_ref, pi_ref, data_ref, x_ref, r_ref, p_ref,
         rr_ref, ap_ref, sm_ref, sems) = refs
        dinv_ref = None
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    i = pl.program_id(0)
    j = pl.program_id(1)
    E = x_ref.shape[0]
    nchunks = E // C

    @pl.when(lax_.bitwise_and(lax_.eq(i, i32(0)), lax_.eq(j, i32(0))))
    def _init():
        cps = [pltpu.make_async_copy(src, dst, sems.at[i32(k)])
               for k, (src, dst) in enumerate(
                   ((xi_ref, x_ref), (ri_ref, r_ref), (pi_ref, p_ref)))]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        # Ap margin chunks are never written by the interior grid: zero
        # them once so the (VMEM-scratch, uninitialized) margins cannot
        # leak into the r update sweeps
        zeros_c = jnp.zeros((C,), jnp.float32)

        def zmargin(c, _):
            ap_ref[pl.ds(lax_.mul(c, i32(C)), C)] = zeros_c
            return 0

        lax_.fori_loop(0, lo_chunks, zmargin, 0)
        lax_.fori_loop(hi_chunk, nchunks, zmargin, 0)

        # γ0 (chunked VMEM sweep; margin chunks are zero and stay zero
        # through the interior-only updates below, so every epilogue
        # sweep runs over [lo_chunks, hi_chunk) only)
        def body(c, acc):
            sl = pl.ds(lax_.mul(c, i32(C)), C)
            seg = r_ref[sl]
            if has_m:
                return acc + jnp.sum(seg * (dinv_ref[sl] * seg))
            return acc + jnp.sum(seg * seg)

        sm_ref[0, 0] = lax_.fori_loop(lo_chunks, hi_chunk, body,
                                      jnp.float32(0))

    @pl.when(lax_.eq(j, i32(0)))
    def _reset_pap():
        sm_ref[0, 1] = jnp.float32(0)

    # ---- chunk pass: Ap chunk + pAp partial --------------------------------
    jc = lax_.add(j, i32(lo_chunks))
    start = lax_.sub(lax_.mul(jc, i32(C)), i32(H))
    start = pl.multiple_of(start, 1024)
    win = p_ref[pl.ds(start, C + 2 * H)]
    acc = None
    for d, o in enumerate(offsets):
        seg = win[H + o: H + o + C]
        term = data_ref[d, :] * seg
        acc = term if acc is None else acc + term
    ap_ref[pl.ds(lax_.mul(jc, i32(C)), C)] = acc

    pc = p_ref[pl.ds(lax_.mul(jc, i32(C)), C)]
    sm_ref[0, 1] = sm_ref[0, 1] + jnp.sum(pc * acc)

    # ---- iteration epilogue on the last chunk ------------------------------
    @pl.when(lax_.eq(j, i32(nblocks - 1)))
    def _epilogue():
        gamma = sm_ref[0, 0]
        pap = sm_ref[0, 1]
        # converged/breakdown guard: alpha=0 freezes the iteration
        alpha = jnp.where(pap > 0,
                          gamma / jnp.where(pap > 0, pap, 1.0), 0.0)

        def upd(c, accs):
            rr_acc, g_acc = accs
            sl = pl.ds(lax_.mul(c, i32(C)), C)
            xc = x_ref[sl] + alpha * p_ref[sl]
            rc = r_ref[sl] - alpha * ap_ref[sl]
            x_ref[sl] = xc
            r_ref[sl] = rc
            rr_acc = rr_acc + jnp.sum(rc * rc)
            if has_m:
                g_acc = g_acc + jnp.sum(rc * (dinv_ref[sl] * rc))
            return (rr_acc, g_acc)

        rr_new, g_new = lax_.fori_loop(
            lo_chunks, hi_chunk, upd, (jnp.float32(0), jnp.float32(0)))
        if not has_m:
            g_new = rr_new
        beta = jnp.where(gamma > 0,
                         g_new / jnp.where(gamma > 0, gamma, 1.0), 0.0)

        def updp(c, _):
            sl = pl.ds(lax_.mul(c, i32(C)), C)
            z = dinv_ref[sl] * r_ref[sl] if has_m else r_ref[sl]
            p_ref[sl] = z + beta * p_ref[sl]
            return 0

        lax_.fori_loop(lo_chunks, hi_chunk, updp, 0)
        sm_ref[0, 0] = g_new
        sm_ref[0, lax_.add(i, i32(2))] = rr_new

    @pl.when(lax_.bitwise_and(lax_.eq(i, i32(K - 1)),
                              lax_.eq(j, i32(nblocks - 1))))
    def _flush_hist():
        for k in range(K):
            rr_ref[k, :] = jnp.broadcast_to(sm_ref[0, k + 2], (128,))


@functools.partial(jax.jit, static_argnames=("offsets", "H", "C",
                                             "lo_chunks", "hi_chunk", "K"))
def _fused_cg_block(x, r, p, data_p, dinv=None, *, offsets, H, C,
                    lo_chunks, hi_chunk, K):
    with jax.enable_x64(False):
        E = x.shape[0]
        ndiag = len(offsets)
        nblocks = data_p.shape[1] // C
        has_m = dinv is not None

        kernel = functools.partial(
            _dia_cg_kernel, offsets=offsets, H=H, C=C,
            lo_chunks=lo_chunks, hi_chunk=hi_chunk, nblocks=nblocks, K=K,
            has_m=has_m)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),             # x (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # r (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # p (HBM)
        ]
        operands = [x, r, p]
        if has_m:
            in_specs.append(full)                          # dinv (VMEM)
            operands.append(dinv)
        in_specs.append(pl.BlockSpec((ndiag, C), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(data_p)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((E,), jnp.float32),   # x
                jax.ShapeDtypeStruct((E,), jnp.float32),   # r
                jax.ShapeDtypeStruct((E,), jnp.float32),   # p
                jax.ShapeDtypeStruct((K, 128), jnp.float32),  # rr hist
            ),
            grid=(K, nblocks),
            in_specs=in_specs,
            out_specs=(full, full, full, full),
            scratch_shapes=[
                pltpu.VMEM((E,), jnp.float32),             # Ap
                pltpu.SMEM((1, 2 + K), jnp.float32),  # [γ, pAp, hist]
                pltpu.SemaphoreType.DMA((3,)),        # state-load DMAs
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * K * ndiag * nblocks * C,
                bytes_accessed=K * ndiag * nblocks * C * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=_INTERPRET,
        )(*operands)


# VMEM the fused launch may plan against (the pallas_call limit is
# 128 MB; leave headroom for Mosaic temporaries and the p window reads)
_FUSED_VMEM_BUDGET = 118 * 1024 * 1024


def make_fused_operator(A, precond: bool = False) \
        -> "ExtendedStencilOperator | None":
    """Extended operator tuned for the fused CG kernel.

    The fused kernel holds four E-length f32 vectors in VMEM (five with
    a diagonal preconditioner), so the chunk choice differs from the
    plain SpMV operator: larger chunks cut grid steps (on-chip sweep r4:
    C=125k·1024 → 106-107 Gnnz/s effective vs 104-105 at the SpMV
    default C), bounded by the VMEM budget (vectors + double-buffered
    data blocks). Candidates prefer minimal row padding first (less data
    streamed per iteration), then the largest chunk. Returns None when
    the matrix/E-budget does not fit the fused layout (caller falls back
    to cg_full on the plain operator).
    """
    if not _HAS_PALLAS:
        return None
    if not _INTERPRET and jax.default_backend() != "tpu":
        return None
    n, m = A.shape
    if n != m or not getattr(A, "offsets", None):
        return None
    if A.data.dtype != jnp.float32:
        return None
    w = max(max(abs(o) for o in A.offsets), 1)
    if w >= n:
        return None
    C = pick_fused_chunk(n, w, len(A.offsets),
                         n_vecs=5 if precond else 4,
                         e_cap=_FUSED_E_CAP)
    if C is None:
        return None
    op = ExtendedStencilOperator(A, chunk=C, resident=True)
    return op if supports_fused_cg(op) else None


def pick_fused_chunk(n: int, w: int, ndiag: int, *, n_vecs: int,
                     e_cap: "int | None" = None,
                     vmem_budget: int = _FUSED_VMEM_BUDGET) \
        -> "int | None":
    """Chunk-size search shared by the fused CG/PCG/BiCGStab layouts:
    candidates prefer minimal row padding, then the largest chunk, under
    a VMEM plan of ``n_vecs`` E-length f32 vectors + double-buffered
    data blocks + the window read. ``e_cap`` additionally bounds E (the
    CG layouts' historical four-vector cap)."""

    def _ru(v, q):
        return -(-v // q) * q

    best = None
    for k in range(128, 0, -1):
        C = k * 1024
        n_pad = _ru(n, C)
        H = _ru(w, 1024)
        E = 2 * _ru(w, C) + n_pad
        if (e_cap is not None and E > e_cap) or E < C + 2 * H:
            continue
        vmem = (n_vecs * E + 2 * ndiag * C + (C + 2 * H)) * 4
        if vmem > vmem_budget:
            continue
        key = (n_pad, -C)
        if best is None or key < best[0]:
            best = (key, C)
    return None if best is None else best[1]


def pick_block_iters(iters_estimate: int, default: int = 16) -> int:
    """Block size minimizing overshoot for a known iteration count:
    smallest K whose launch count matches K=32's (e.g. 92 → 31: three
    launches run 93 iterations instead of 96 at K=32)."""
    it = int(iters_estimate)
    if it <= 0:
        return default
    launches = -(-it // 32)
    return min(max(-(-it // launches), 4), 64)


def supports_fused_cg(op) -> bool:
    """The fused kernel needs the resident extended layout and four
    E-length f32 vectors in VMEM."""
    return (_HAS_PALLAS
            and isinstance(op, ExtendedStencilOperator)
            and op.dtype == jnp.float32
            and op.E <= _FUSED_E_CAP
            and op.E % op.C == 0)


def fused_cg_ext(op: ExtendedStencilOperator, b: jax.Array, *,
                 tol: float = 1e-6, atol: float = 0.0,
                 maxiter: "int | None" = None, block_iters: int = 16,
                 dinv: "jax.Array | None" = None):
    """CG on the extended-space stencil operator with the fused kernel.

    Contract matches cg_full: run until ``||r|| <= max(tol*||b||, atol)``
    or maxiter, in launches of ``block_iters`` iterations (iteration
    count reported from the ||r||^2 history; overshoot past the crossing
    is under one launch and only improves x). ``dinv`` (ORIGINAL-space
    inverse-diagonal, e.g. a Jacobi preconditioner's vector) switches
    the kernel to fused Jacobi-PCG. Returns (x, info, iters, res) with
    x in the ORIGINAL (non-extended) space.
    """
    if not supports_fused_cg(op):
        raise ValueError("operator does not support the fused CG kernel")
    if maxiter is None:
        maxiter = 10 * op.n  # reference default (torch_sparse_linalg.py:982)
    b = b.astype(jnp.float32)
    b_norm = jnp.linalg.norm(b)
    thresh = jnp.maximum(tol * b_norm, atol).astype(jnp.float32)
    thresh2 = thresh * thresh
    b_ext = op.extend(b)
    dinv_ext = (None if dinv is None
                else op.extend_diag(dinv.astype(jnp.float32)))
    K = int(block_iters)

    kw = dict(offsets=op.offsets, H=op.H, C=op.C,
              lo_chunks=op.Wl // op.C,
              hi_chunk=op.Wl // op.C + op.n_pad // op.C, K=K)

    def body(state):
        x, r, p, hist, done_iters, _, first_iter = state
        x, r, p, hist2d = _fused_cg_block(x, r, p, op.data_p, dinv_ext,
                                          **kw)
        hist = hist2d[:, 0]
        # global first crossing: ||r||^2 is not monotone in CG, so a
        # mid-launch crossing must stop the outer loop even if the
        # boundary value bounced back above thresh2
        crossed = hist <= thresh2
        cand = done_iters + jnp.argmax(crossed).astype(jnp.int32) + 1
        first_iter = jnp.where((first_iter < 0) & jnp.any(crossed),
                               cand, first_iter)
        return (x, r, p, hist, done_iters + K, hist[K - 1], first_iter)

    def cond(state):
        _, _, _, _, done_iters, rr_last, first_iter = state
        return (first_iter < 0) & (done_iters < maxiter) \
            & jnp.isfinite(rr_last)

    big = jnp.float32(3.0e38)  # finite so the first cond passes
    x0 = jnp.zeros_like(b_ext)
    p0 = b_ext if dinv_ext is None else dinv_ext * b_ext  # z0 = D⁻¹ r0
    state0 = (x0, b_ext, p0, jnp.full((K,), big, jnp.float32),
              jnp.array(0, jnp.int32), big, jnp.array(-1, jnp.int32))
    x, r, p, hist, done, rr_last, first_iter = jax.lax.while_loop(
        cond, body, state0)
    iters = jnp.where(first_iter >= 0, first_iter, done)
    # cg_full contract: the reported residual/info come from the TRUE
    # residual (one extra SpMV), not the f32 recurrence value
    from tpu_sparse.solvers.krylov import _final_check_relax

    res = jnp.linalg.norm(b_ext - op(x))
    relax = _final_check_relax(jnp.float32)
    ok = jnp.isfinite(res) & (res <= thresh * relax) \
        & jnp.isfinite(jnp.linalg.norm(x))
    info = jnp.where(ok, 0, -1).astype(jnp.int32)
    return op.extract(x), info, iters.astype(jnp.int32), res
