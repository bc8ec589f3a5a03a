"""Fused whole-iteration Pallas BiCGStab (extended-space stencil).

Same design as the fused CG (kernels/pallas_cg.py): the Krylov state
lives in VMEM across iterations and every dot/axpy folds into the two
SpMV stream passes, so per-iteration HBM traffic is 2× the diagonal
stream (BiCGStab's two matvecs) instead of the while-loop path's ~10
separate vector passes + 4 reduction rounds. r4 motivation: the
bicgstab_110M row measured 2.9 ms/iteration against a ~1.55 ms
two-stream bound.

Iteration layout (grid = (K iterations, 2 phases, nblocks chunks)):

  phase 0 chunk pass : q = A p, partial ⟨r̂, q⟩
  phase 0 epilogue   : α = ρ/⟨r̂,q⟩ ; s-sweep r ← r − α q
  phase 1 chunk pass : t = A r, partials ⟨t, r⟩, ⟨t, t⟩
  phase 1 epilogue   : ω = ⟨t,s⟩/⟨t,t⟩ ; x ← x + α p + ω s ;
                       r ← s − ω t accumulating ⟨r,r⟩ and ρ' = ⟨r̂, r⟩ ;
                       β = (ρ'/ρ)(α/ω) ; p ← r + β (p − ω q)

ρ re-derives at launch init from ⟨r̂, r⟩ (its value at the previous
launch's end), so no scalar crosses launches. Breakdown handling matches
the reference's codes (torch_sparse_linalg.py:902-934): ρ or ⟨r̂,q⟩
collapse → the iteration freezes (identity) and the ‖r‖² history slot is
written as −10.0 / −11.0, which the outer loop converts to info codes.
ω ≈ 0 with ‖s‖ above tolerance freezes as −11; ‖s‖ small is the classic
early-exit (x ← x + α p) and converges on the next history check.
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

# x, r, p outputs + r̂, q, t residents/scratch = six E-length f32 vectors
_VMEM_BUDGET = 118 * 1024 * 1024


def _dia_bicgstab_kernel(xi_ref, ri_ref, pi_ref, rh_ref, data_ref,
                         x_ref, r_ref, p_ref, hist_ref,
                         rhat_ref, q_ref, t_ref, sm_ref, sems, *,
                         offsets, H, C, lo_chunks, hi_chunk, nblocks, K):
    """One grid step = (iteration i, phase ph, INTERIOR chunk j).

    sm layout (1, 8 + K): [0]=ρ  [1]=⟨r̂,q⟩  [2]=⟨t,s⟩  [3]=⟨t,t⟩
    [4]=α  [5]=ω  [6]=frozen flag  [7]=‖s‖² partial  [8+i]=rr history
    (negative = breakdown code)."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    f32 = jnp.float32
    i = pl.program_id(0)
    ph = pl.program_id(1)
    j = pl.program_id(2)
    E = x_ref.shape[0]
    nchunks = E // C
    eps = f32(1.1754944e-38)   # f32 tiny: division guards
    eps_rel = f32(1.1920929e-07)  # f32 machine eps: breakdown tests
    #                               (reference torch_sparse_linalg.py:902-934)

    @pl.when(lax_.eq(lax_.add(lax_.add(i, ph), j), i32(0)))
    def _init():
        cps = [pltpu.make_async_copy(src, dst, sems.at[i32(k)])
               for k, (src, dst) in enumerate(
                   ((xi_ref, x_ref), (ri_ref, r_ref), (pi_ref, p_ref),
                    (rh_ref, rhat_ref)))]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        zeros_c = jnp.zeros((C,), f32)

        def zmargin(c, _):
            sl = pl.ds(lax_.mul(c, i32(C)), C)
            q_ref[sl] = zeros_c
            t_ref[sl] = zeros_c
            return 0

        lax_.fori_loop(0, lo_chunks, zmargin, 0)
        lax_.fori_loop(hi_chunk, nchunks, zmargin, 0)

        # ρ = ⟨r̂, r⟩ (value at the previous launch's end)
        def body(c, acc):
            sl = pl.ds(lax_.mul(c, i32(C)), C)
            return acc + jnp.sum(rhat_ref[sl] * r_ref[sl])

        sm_ref[0, 0] = lax_.fori_loop(lo_chunks, hi_chunk, body, f32(0))
        sm_ref[0, 6] = f32(0)   # frozen flag

    @pl.when(lax_.eq(j, i32(0)))
    def _reset_partials():
        @pl.when(lax_.eq(ph, i32(0)))
        def _():
            sm_ref[0, 1] = f32(0)

        @pl.when(lax_.eq(ph, i32(1)))
        def _():
            sm_ref[0, 2] = f32(0)
            sm_ref[0, 3] = f32(0)

    # ---- chunk pass: one matvec stream + partial dots -----------------------
    jc = lax_.add(j, i32(lo_chunks))
    start = lax_.sub(lax_.mul(jc, i32(C)), i32(H))
    start = pl.multiple_of(start, 1024)
    sl = pl.ds(lax_.mul(jc, i32(C)), C)

    @pl.when(lax_.eq(ph, i32(0)))
    def _phase_q():
        win = p_ref[pl.ds(start, C + 2 * H)]
        acc = None
        for d, o in enumerate(offsets):
            seg = win[H + o: H + o + C]
            term = data_ref[d, :] * seg
            acc = term if acc is None else acc + term
        q_ref[sl] = acc
        sm_ref[0, 1] = sm_ref[0, 1] + jnp.sum(rhat_ref[sl] * acc)

    @pl.when(lax_.eq(ph, i32(1)))
    def _phase_t():
        win = r_ref[pl.ds(start, C + 2 * H)]   # r holds s
        acc = None
        for d, o in enumerate(offsets):
            seg = win[H + o: H + o + C]
            term = data_ref[d, :] * seg
            acc = term if acc is None else acc + term
        t_ref[sl] = acc
        sc = r_ref[sl]
        sm_ref[0, 2] = sm_ref[0, 2] + jnp.sum(acc * sc)
        sm_ref[0, 3] = sm_ref[0, 3] + jnp.sum(acc * acc)

    # ---- phase epilogues on the last chunk ----------------------------------
    @pl.when(lax_.bitwise_and(lax_.eq(ph, i32(0)),
                              lax_.eq(j, i32(nblocks - 1))))
    def _epilogue_a():
        rho = sm_ref[0, 0]
        rhq = sm_ref[0, 1]
        ok = jnp.logical_and(jnp.abs(rhq) > eps,
                             sm_ref[0, 6] == f32(0))
        alpha = jnp.where(ok, rho / jnp.where(ok, rhq, 1.0), 0.0)
        sm_ref[0, 4] = alpha

        # ⟨r̂,q⟩ breakdown (reference code −11): freeze and flag
        @pl.when(jnp.logical_and(jnp.logical_not(ok),
                                 sm_ref[0, 6] == f32(0)))
        def _():
            sm_ref[0, 6] = f32(-11)

        def s_sweep(c, ss):
            slc = pl.ds(lax_.mul(c, i32(C)), C)
            sc = r_ref[slc] - alpha * q_ref[slc]
            r_ref[slc] = sc
            return ss + jnp.sum(sc * sc)

        sm_ref[0, 7] = lax_.fori_loop(lo_chunks, hi_chunk, s_sweep, f32(0))

    @pl.when(lax_.bitwise_and(lax_.eq(ph, i32(1)),
                              lax_.eq(j, i32(nblocks - 1))))
    def _epilogue_b():
        rho = sm_ref[0, 0]
        alpha = sm_ref[0, 4]
        ts = sm_ref[0, 2]
        tt = sm_ref[0, 3]
        frozen = sm_ref[0, 6] != f32(0)
        ok_t = jnp.logical_and(tt > eps, jnp.logical_not(frozen))
        omega = jnp.where(ok_t, ts / jnp.where(ok_t, tt, 1.0), 0.0)
        sm_ref[0, 5] = omega

        def xr_sweep(c, accs):
            rr_acc, rho_acc = accs
            slc = pl.ds(lax_.mul(c, i32(C)), C)
            sc = r_ref[slc]
            x_ref[slc] = x_ref[slc] + alpha * p_ref[slc] + omega * sc
            rc = sc - omega * t_ref[slc]
            r_ref[slc] = rc
            return (rr_acc + jnp.sum(rc * rc),
                    rho_acc + jnp.sum(rhat_ref[slc] * rc))

        rr_new, rho_new = lax_.fori_loop(lo_chunks, hi_chunk, xr_sweep,
                                         (f32(0), f32(0)))

        # ρ or ω collapse → freeze next iterations; ω≈0 with ‖s‖ still
        # large is the −11 class, ρ collapse the −10 class. tiny ‖s‖
        # (early-exit) is convergence, not breakdown.
        ss = sm_ref[0, 7]
        rho_bad = jnp.abs(rho_new) < eps_rel * jnp.abs(rho)
        omega_bad = jnp.logical_and(jnp.abs(omega) < eps_rel, ss > eps)

        @pl.when(jnp.logical_and(sm_ref[0, 6] == f32(0), omega_bad))
        def _():
            sm_ref[0, 6] = f32(-11)

        @pl.when(jnp.logical_and(sm_ref[0, 6] == f32(0), rho_bad))
        def _():
            sm_ref[0, 6] = f32(-10)

        beta = jnp.where(
            jnp.logical_and(jnp.abs(rho) > eps, jnp.abs(omega) > eps),
            (rho_new / jnp.where(jnp.abs(rho) > eps, rho, 1.0))
            * (alpha / jnp.where(jnp.abs(omega) > eps, omega, 1.0)),
            0.0)
        frozen2 = sm_ref[0, 6] != f32(0)
        beta = jnp.where(frozen2, 0.0, beta)

        def p_sweep(c, _):
            slc = pl.ds(lax_.mul(c, i32(C)), C)
            p_ref[slc] = r_ref[slc] + beta * (p_ref[slc]
                                              - omega * q_ref[slc])
            return 0

        lax_.fori_loop(lo_chunks, hi_chunk, p_sweep, 0)
        sm_ref[0, 0] = rho_new
        # history: rr, or the breakdown code once frozen
        sm_ref[0, lax_.add(i, i32(8))] = jnp.where(
            frozen2, sm_ref[0, 6], rr_new)

    @pl.when(lax_.bitwise_and(
        lax_.eq(i, i32(K - 1)),
        lax_.bitwise_and(lax_.eq(ph, i32(1)),
                         lax_.eq(j, i32(nblocks - 1)))))
    def _flush_hist():
        for k in range(K):
            hist_ref[k, :] = jnp.broadcast_to(sm_ref[0, k + 8], (128,))


@functools.partial(jax.jit, static_argnames=("offsets", "H", "C",
                                             "lo_chunks", "hi_chunk", "K"))
def _fused_bicgstab_block(x, r, p, rhat, data_p, *, offsets, H, C,
                          lo_chunks, hi_chunk, K):
    with jax.enable_x64(False):
        E = x.shape[0]
        ndiag = len(offsets)
        nblocks = data_p.shape[1] // C

        kernel = functools.partial(
            _dia_bicgstab_kernel, offsets=offsets, H=H, C=C,
            lo_chunks=lo_chunks, hi_chunk=hi_chunk, nblocks=nblocks, K=K)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((E,), jnp.float32),   # x
                jax.ShapeDtypeStruct((E,), jnp.float32),   # r
                jax.ShapeDtypeStruct((E,), jnp.float32),   # p
                jax.ShapeDtypeStruct((K, 128), jnp.float32),  # history
            ),
            grid=(K, 2, nblocks),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),         # x (HBM)
                pl.BlockSpec(memory_space=pl.ANY),         # r (HBM)
                pl.BlockSpec(memory_space=pl.ANY),         # p (HBM)
                pl.BlockSpec(memory_space=pl.ANY),         # r̂ (HBM)
                pl.BlockSpec((ndiag, C), lambda i, ph, j: (0, j),
                             memory_space=pltpu.VMEM),     # data stream
            ],
            out_specs=(full, full, full, full),
            scratch_shapes=[
                pltpu.VMEM((E,), jnp.float32),             # r̂ resident
                pltpu.VMEM((E,), jnp.float32),             # q
                pltpu.VMEM((E,), jnp.float32),             # t
                pltpu.SMEM((1, 8 + K), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * K * ndiag * nblocks * C,
                bytes_accessed=2 * K * ndiag * nblocks * C * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=_INTERPRET,
        )(x, r, p, rhat, data_p)


def make_fused_bicgstab_operator(A) -> "ExtendedStencilOperator | None":
    """Operator tuned for the fused BiCGStab layout (six E-length
    vectors; see make_fused_operator for the scheme)."""
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
    from tpu_sparse.kernels.pallas_cg import pick_fused_chunk

    C = pick_fused_chunk(n, w, len(A.offsets), n_vecs=6,
                         vmem_budget=_VMEM_BUDGET)
    if C is None:
        return None
    op = ExtendedStencilOperator(A, chunk=C, resident=True)
    return op if supports_fused_bicgstab(op) else None


def supports_fused_bicgstab(op) -> bool:
    if not (_HAS_PALLAS and isinstance(op, ExtendedStencilOperator)
            and op.dtype == jnp.float32 and op.E % op.C == 0):
        return False
    ndiag = len(op.offsets)
    vmem = (6 * op.E + 2 * ndiag * op.C + (op.C + 2 * op.H)) * 4
    return vmem <= _VMEM_BUDGET


def fused_bicgstab_ext(op: ExtendedStencilOperator, b: jax.Array, *,
                       tol: float = 1e-6, atol: float = 0.0,
                       maxiter: "int | None" = None,
                       block_iters: int = 12):
    """BiCGStab on the extended-space stencil operator with the fused
    kernel. Contract matches bicgstab_full: stop on
    ``‖r‖ ≤ max(tol·‖b‖, atol)`` / maxiter / breakdown (info −10/−11),
    true-residual final check. Returns (x, info, iters, res) in the
    ORIGINAL space."""
    if not supports_fused_bicgstab(op):
        raise ValueError("operator does not support fused BiCGStab")
    if maxiter is None:
        maxiter = 10 * op.n
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
        x, r, p, hist2d = _fused_bicgstab_block(x, r, p, b_ext, op.data_p,
                                                **kw)
        hist = hist2d[:, 0]
        return (x, r, p, hist, done_iters + K, hist[K - 1])

    def cond(state):
        _, _, _, _, done_iters, last = state
        return (last > thresh2) & (done_iters < maxiter) \
            & jnp.isfinite(last)

    big = jnp.float32(3.0e38)
    x0 = jnp.zeros_like(b_ext)
    state0 = (x0, b_ext, b_ext, jnp.full((K,), big, jnp.float32),
              jnp.array(0, jnp.int32), big)
    x, r, p, hist, done, last = jax.lax.while_loop(cond, body, state0)

    # first event inside the final launch: convergence or breakdown
    crossed = hist <= thresh2          # includes negative breakdown codes
    first = jnp.argmax(crossed)
    any_crossed = jnp.any(crossed)
    iters = jnp.where(any_crossed, done - K + first + 1, done)
    code = hist[first]                 # negative iff breakdown
    broke = any_crossed & (code < 0)

    from tpu_sparse.solvers.krylov import _final_check_relax

    res = jnp.linalg.norm(b_ext - op(x))
    relax = _final_check_relax(jnp.float32)
    conv = jnp.isfinite(res) & (res <= thresh * relax) \
        & jnp.isfinite(jnp.linalg.norm(x))
    # a breakdown that still meets the tolerance reports success (the
    # classic early-exit); otherwise surface the reference's codes
    info = jnp.where(conv, 0,
                     jnp.where(broke, code.astype(jnp.int32), -1))
    return op.extract(x), info, iters.astype(jnp.int32), res
