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


def _dia_cg_kernel(xi_ref, ri_ref, pi_ref, data_ref, x_ref, r_ref, p_ref,
                   rr_ref, ap_ref, sm_ref, sems, *, offsets, H, C,
                   lo_chunks, hi_chunk, nchunks, K):
    """One grid step = (iteration i, chunk j).

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
    sm_ref is (1, 2 + K) SMEM [rr, pAp, hist...]; sems: 3 DMA
    semaphores for the state load."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    i = pl.program_id(0)
    j = pl.program_id(1)
    E = x_ref.shape[0]

    @pl.when(lax_.bitwise_and(lax_.eq(i, i32(0)), lax_.eq(j, i32(0))))
    def _init():
        cps = [pltpu.make_async_copy(src, dst, sems.at[i32(k)])
               for k, (src, dst) in enumerate(
                   ((xi_ref, x_ref), (ri_ref, r_ref), (pi_ref, p_ref)))]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        # rr0 = <r, r> (chunked VMEM sweep; margins are zero)
        def body(c, acc):
            seg = r_ref[pl.ds(lax_.mul(c, i32(C)), C)]
            return acc + jnp.sum(seg * seg)

        sm_ref[0, 0] = lax_.fori_loop(0, nchunks, body, jnp.float32(0))

    @pl.when(lax_.eq(j, i32(0)))
    def _reset_pap():
        sm_ref[0, 1] = jnp.float32(0)

    # ---- chunk pass: Ap chunk + pAp partial --------------------------------
    is_margin = lax_.bitwise_or(lax_.lt(j, i32(lo_chunks)),
                                lax_.ge(j, i32(hi_chunk)))
    start = lax_.sub(lax_.mul(j, i32(C)), i32(H))
    start = lax_.clamp(i32(0), start, i32(E - (C + 2 * H)))
    start = pl.multiple_of(start, 1024)
    win = p_ref[pl.ds(start, C + 2 * H)]
    acc = None
    for d, o in enumerate(offsets):
        seg = win[H + o: H + o + C]
        term = data_ref[d, :] * seg
        acc = term if acc is None else acc + term
    acc = jnp.where(is_margin, 0.0, acc)
    ap_ref[pl.ds(lax_.mul(j, i32(C)), C)] = acc

    @pl.when(jnp.logical_not(is_margin))
    def _accum_pap():
        pc = p_ref[pl.ds(lax_.mul(j, i32(C)), C)]
        sm_ref[0, 1] = sm_ref[0, 1] + jnp.sum(pc * acc)

    # ---- iteration epilogue on the last chunk ------------------------------
    @pl.when(lax_.eq(j, i32(nchunks - 1)))
    def _epilogue():
        rr = sm_ref[0, 0]
        pap = sm_ref[0, 1]
        # converged/breakdown guard: alpha=0 freezes the iteration
        alpha = jnp.where(pap > 0, rr / jnp.where(pap > 0, pap, 1.0), 0.0)

        def upd(c, rr_acc):
            sl = pl.ds(lax_.mul(c, i32(C)), C)
            xc = x_ref[sl] + alpha * p_ref[sl]
            rc = r_ref[sl] - alpha * ap_ref[sl]
            x_ref[sl] = xc
            r_ref[sl] = rc
            return rr_acc + jnp.sum(rc * rc)

        rr_new = lax_.fori_loop(0, nchunks, upd, jnp.float32(0))
        beta = jnp.where(rr > 0, rr_new / jnp.where(rr > 0, rr, 1.0), 0.0)

        def updp(c, _):
            sl = pl.ds(lax_.mul(c, i32(C)), C)
            p_ref[sl] = r_ref[sl] + beta * p_ref[sl]
            return 0

        lax_.fori_loop(0, nchunks, updp, 0)
        sm_ref[0, 0] = rr_new
        sm_ref[0, lax_.add(i, i32(2))] = rr_new

    @pl.when(lax_.bitwise_and(lax_.eq(i, i32(K - 1)),
                              lax_.eq(j, i32(nchunks - 1))))
    def _flush_hist():
        for k in range(K):
            rr_ref[k, :] = jnp.broadcast_to(sm_ref[0, k + 2], (128,))


@functools.partial(jax.jit, static_argnames=("offsets", "H", "C",
                                             "lo_chunks", "hi_chunk", "K"))
def _fused_cg_block(x, r, p, data_p, *, offsets, H, C, lo_chunks,
                    hi_chunk, K):
    with jax.enable_x64(False):
        E = x.shape[0]
        nchunks = E // C
        ndiag = len(offsets)
        nblocks = data_p.shape[1] // C

        def data_map(i, j):
            idx = jax.lax.max(
                jax.lax.sub(j, jnp.array(lo_chunks, jnp.int32)),
                jnp.array(0, jnp.int32))
            idx = jax.lax.min(idx, jnp.array(nblocks - 1, jnp.int32))
            return (0, idx)

        kernel = functools.partial(
            _dia_cg_kernel, offsets=offsets, H=H, C=C,
            lo_chunks=lo_chunks, hi_chunk=hi_chunk, nchunks=nchunks, K=K)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((E,), jnp.float32),   # x
                jax.ShapeDtypeStruct((E,), jnp.float32),   # r
                jax.ShapeDtypeStruct((E,), jnp.float32),   # p
                jax.ShapeDtypeStruct((K, 128), jnp.float32),  # rr hist
            ),
            grid=(K, nchunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),      # x (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),      # r (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),      # p (HBM)
                pl.BlockSpec((ndiag, C), data_map,
                             memory_space=pltpu.VMEM),     # data stream
            ],
            out_specs=(full, full, full, full),
            scratch_shapes=[
                pltpu.VMEM((E,), jnp.float32),             # Ap
                pltpu.SMEM((1, 2 + K), jnp.float32),  # [rr, pAp, hist]
                pltpu.SemaphoreType.DMA((3,)),        # state-load DMAs
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * K * ndiag * (hi_chunk - lo_chunks) * C,
                bytes_accessed=K * ndiag * (hi_chunk - lo_chunks) * C * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=_INTERPRET,
        )(x, r, p, data_p)


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
                 maxiter: int = 1000, block_iters: int = 16):
    """CG on the extended-space stencil operator with the fused kernel.

    Contract matches cg_full: run until ``||r|| <= max(tol*||b||, atol)``
    or maxiter, in launches of ``block_iters`` iterations (iteration
    count reported from the ||r||^2 history; overshoot past the crossing
    is under one launch and only improves x). Returns
    (x, info, iters, res) with x in the ORIGINAL (non-extended) space.
    """
    if not supports_fused_cg(op):
        raise ValueError("operator does not support the fused CG kernel")
    b = b.astype(jnp.float32)
    b_norm = jnp.linalg.norm(b)
    thresh = jnp.maximum(tol * b_norm, atol).astype(jnp.float32)
    thresh2 = thresh * thresh
    b_ext = op.extend(b)
    K = int(block_iters)

    kw = dict(offsets=op.offsets, H=op.H, C=op.C,
              lo_chunks=op.Wl // op.C,
              hi_chunk=op.Wl // op.C + op.n_pad // op.C, K=K)

    def body(state):
        x, r, p, hist, done_iters, _ = state
        x, r, p, hist2d = _fused_cg_block(x, r, p, op.data_p, **kw)
        hist = hist2d[:, 0]
        return (x, r, p, hist, done_iters + K, hist[K - 1])

    def cond(state):
        _, _, _, _, done_iters, rr_last = state
        return (rr_last > thresh2) & (done_iters < maxiter) \
            & jnp.isfinite(rr_last)

    big = jnp.float32(3.0e38)  # finite so the first cond passes
    x0 = jnp.zeros_like(b_ext)
    state0 = (x0, b_ext, b_ext, jnp.full((K,), big, jnp.float32),
              jnp.array(0, jnp.int32), big)
    x, r, p, hist, done, rr_last = jax.lax.while_loop(cond, body, state0)
    # exact iteration count: first crossing inside the final launch
    crossed = hist <= thresh2
    first = jnp.argmax(crossed)
    any_crossed = jnp.any(crossed)
    iters = jnp.where(any_crossed, done - K + first + 1, done)
    res = jnp.sqrt(jnp.maximum(rr_last, 0.0))
    ok = jnp.isfinite(res) & (res <= thresh)
    info = jnp.where(ok, 0, -1).astype(jnp.int32)
    return op.extract(x), info, iters.astype(jnp.int32), res
