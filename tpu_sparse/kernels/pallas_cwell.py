"""Pallas CWELL SpMV — general-structure sparse matrices on the TPU VPU.

This is the "cuSPARSE for arbitrary matrices" kernel the north star
requires (SURVEY.md §2.2; reference reaches cuSPARSE through torch.sparse,
``solver.py:365``). Mosaic supports exactly one gather shape — same-shape
``take_along_axis(axis=1)`` (lane gather) — so the CWELL format
(sparse/cwell.py) pre-arranges every nonzero so that one plane of 128
values gathers from a 256-wide, 128-aligned column window in a single
lane-gather pair:

  grid step = RB row blocks (RB·128 rows). Per plane s of each block:
    1. read the plane's window row ``srow`` from the SMEM-streamed srow
       block, copy x2d[srow] and x2d[srow+1] (two aligned (1,128) VMEM
       rows) into an (8,128) window scratch — 8 planes share one scratch
       pass;
    2. lane-gather both halves with the plane's idx2 (∈[0,256)), select by
       idx2<128, multiply by the value plane, accumulate;
    3. after all planes: y row-block = Σ over the 8 accumulator sublanes.

x stays fully VMEM-resident (f32, m ≤ ~1.5M); vals/idx2 stream through the
auto-pipelined grid; srow streams as an SMEM block. No scatter exists
anywhere: output rows are lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_sparse.sparse.cwell import CWELL, LW

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_INTERPRET = False

# x must stay VMEM-resident next to the streamed plane blocks
_X_VMEM_LIMIT = 1536 * 1024  # elements (6 MB f32)


def _cwell_kernel(srow_ref, x2d_ref, vals_ref, idx2_ref, y_ref, xw,
                  *, RB, S, UCAP=None):
    """srow_ref: (1, RB, S) SMEM block; x2d_ref: (R, 128) VMEM (whole x);
    vals_ref/idx2_ref: (RB, S, 128) VMEM blocks; y_ref: (RB, 128);
    xw: (2*8, 128) VMEM scratch (lo/hi window rows for 8 planes).

    Both loops are FULLY unrolled (Mosaic's fori_loop supports only
    unroll=1 or unroll=num_steps): measured on TPU, rolled loops leave the
    kernel latency-bound on the scalar srow reads at ~4.8 Gnnz/s while
    full unroll reaches ~48 Gnnz/s (10x). _pick_rb caps RB so the total
    unrolled plane-group count RB*S/8 stays bounded (compile ~2 s)."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    G = S // 8

    def g_body(g, carry):
        rb, acc = carry
        base = lax_.mul(g, i32(8))
        for s in range(8):
            r = srow_ref[0, rb, lax_.add(base, i32(s))]
            xw[s, :] = x2d_ref[r, :]
            xw[8 + s, :] = x2d_ref[lax_.add(r, i32(1)), :]
        idx = idx2_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        lo = jnp.take_along_axis(
            xw[0:8, :], jnp.minimum(idx, 127), axis=1)
        hi = jnp.take_along_axis(
            xw[8:16, :], jnp.clip(idx - 128, 0, 127), axis=1)
        gathered = jnp.where(idx < 128, lo, hi)
        v = vals_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        if v.dtype != jnp.float32:  # bf16 stream, f32 accumulate
            v = v.astype(jnp.float32)
        acc = acc + v * gathered
        return rb, acc

    def rb_body(rb, _):
        acc = jnp.zeros((8, LW), jnp.float32)
        if UCAP is None or G <= UCAP:
            _, acc = lax_.fori_loop(0, G, g_body, (rb, acc),
                                    unroll=G if G <= 384 else 1)
        else:
            # compile-lite: rolled outer loop over super-groups with an
            # unrolled UCAP-group inner body (latency hides within each
            # block; Mosaic code size is ~UCAP steps instead of G)
            U = UCAP

            def super_body(t, carry):
                def inner(u, c):
                    return g_body(lax_.add(lax_.mul(t, i32(U)), u), c)

                return lax_.fori_loop(0, U, inner, carry, unroll=U)

            carry = lax_.fori_loop(0, G // U, super_body, (rb, acc),
                                   unroll=1)
            rem = G % U
            if rem:
                def inner_e(u, c):
                    return g_body(lax_.add(i32((G // U) * U), u), c)

                carry = lax_.fori_loop(0, rem, inner_e, carry,
                                       unroll=rem)
            _, acc = carry
        y_ref[rb, :] = jnp.sum(acc, axis=0)
        return 0

    lax_.fori_loop(0, RB, rb_body, 0, unroll=1 if UCAP is not None else RB)


def _gq_window_sources(srowq_ref, rb, g, refs, Q):
    """(8, LW) lo/hi gather sources for group ``g`` of row block ``rb``,
    for EVERY ref in ``refs``, reading each of the group's J = 8//Q run
    srow scalars exactly once (shared by the f32 and DF grouped kernels;
    the DF kernel indexes xh2d and xl2d from the same reads)."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    J = 8 // Q
    lo = [[] for _ in refs]
    hi = [[] for _ in refs]
    for j in range(J):
        r = srowq_ref[0, rb, lax_.add(lax_.mul(g, i32(J)), i32(j))]
        rp1 = lax_.add(r, i32(1))
        for i, ref in enumerate(refs):
            lo[i].append(jnp.broadcast_to(ref[r, :][None, :], (Q, LW)))
            hi[i].append(jnp.broadcast_to(ref[rp1, :][None, :], (Q, LW)))
    out = []
    for i in range(len(refs)):
        if J == 1:
            out.append((lo[i][0], hi[i][0]))
        else:
            out.append((jnp.concatenate(lo[i], axis=0),
                        jnp.concatenate(hi[i], axis=0)))
    return out


def _cwell_kernel_gq(srowq_ref, x2d_ref, vals_ref, idx2_ref, y_ref,
                     *, RB, S, Q):
    """Grouped-plane variant: every aligned run of Q planes shares one
    window row (csr_to_cwell(group=Q)), so the 16 dynamic x2d row reads
    per 8-plane group collapse to 2*(8/Q) reads + sublane broadcasts.
    srowq_ref is the per-RUN window row: (1, RB, S//Q) SMEM."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    G = S // 8

    def g_body(g, carry):
        rb, acc = carry
        ((lo_src, hi_src),) = _gq_window_sources(srowq_ref, rb, g,
                                                 [x2d_ref], Q)
        idx = idx2_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        lo = jnp.take_along_axis(lo_src, jnp.minimum(idx, 127), axis=1)
        hi = jnp.take_along_axis(hi_src, jnp.clip(idx - 128, 0, 127),
                                 axis=1)
        gathered = jnp.where(idx < 128, lo, hi)
        v = vals_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        if v.dtype != jnp.float32:  # bf16 stream, f32 accumulate
            v = v.astype(jnp.float32)
        acc = acc + v * gathered
        return rb, acc

    def rb_body(rb, _):
        acc = jnp.zeros((8, LW), jnp.float32)
        _, acc = lax_.fori_loop(0, G, g_body, (rb, acc), unroll=G if G <= 384 else 1)
        y_ref[rb, :] = jnp.sum(acc, axis=0)
        return 0

    lax_.fori_loop(0, RB, rb_body, 0, unroll=RB)


@functools.partial(jax.jit, static_argnames=("shape", "rb", "group",
                                             "unroll_cap"))
def _cwell_spmv_impl(vals, idx2, srow, x, *, shape, rb, group=1,
                     unroll_cap=None):
    with jax.enable_x64(False):  # 32-bit trace mode for Mosaic
        return _cwell_spmv_inner(vals, idx2, srow, x, shape=shape, rb=rb,
                                 group=group, unroll_cap=unroll_cap)


def _cwell_spmv_inner(vals, idx2, srow, x, *, shape, rb, group=1,
                      unroll_cap=None):
    grouped = group > 1
    nb, S, _ = vals.shape
    n, m = shape
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    x2d = jnp.pad(x, (0, m_pad - m)).reshape(-1, LW)
    grid = (nb + rb - 1) // rb
    nb_pad = grid * rb
    if grouped:
        srow = srow[:, ::group]  # per-run window row (uniform within runs)
    if nb_pad != nb:
        vals = jnp.pad(vals, ((0, nb_pad - nb), (0, 0), (0, 0)))
        idx2 = jnp.pad(idx2, ((0, nb_pad - nb), (0, 0), (0, 0)))
        srow = jnp.pad(srow, ((0, nb_pad - nb), (0, 0)))
    # Mosaic constrains the last two block dims to (8,128)-divisible OR
    # full-array; give srow a leading grid axis so its block IS the full
    # trailing array.
    srow3 = srow.reshape(grid, rb, srow.shape[1])

    kernel = (functools.partial(_cwell_kernel_gq, RB=rb, S=S, Q=group)
              if grouped else
              functools.partial(_cwell_kernel, RB=rb, S=S,
                                UCAP=unroll_cap))
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb_pad, LW), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, rb, srow.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d fully resident
            pl.BlockSpec((rb, S, LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[] if grouped else [
            pltpu.VMEM((16, LW), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nb_pad * S * LW,
            bytes_accessed=(nb_pad * S * LW * (vals.dtype.itemsize + 4)
                            + (m_pad + nb_pad * LW) * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(srow3, x2d, vals, idx2)
    return y.reshape(-1)[:n]


def _pick_rb(S: int) -> int:
    # TPU sweep on the 27-pt stencil (S=40): rb=16 -> 38.6 Gnnz/s beats
    # rb=8 (32.9), rb=24 (15.8), rb=32 (28.2), rb=48 (14.4) — power-of-two
    # rb with a bounded unrolled plane-group count (rb*S/8) is the sweet
    # spot. Drop to rb=8 for plane-rich matrices to bound compile time.
    G = max(S // 8, 1)
    rb = 8 if G > 16 else 16
    # VMEM guard: the vals and idx2 windows are rb*S*LW*4 B each and
    # Mosaic double-buffers both; plane-rich packs (LU factors reach
    # S in the thousands) must shrink rb (r3 on-chip finding: S=7376 at
    # rb=8 allocated 2x57.6 MB windows and OOM'd the 128 MB VMEM).
    # rb floor is 8: the (rb, LW) output block needs 8-divisible sublanes.
    while rb > 8 and 4 * rb * S * LW * 4 > _WINDOW_VMEM_BUDGET:
        rb //= 2
    return rb


# vals+idx2 stream windows, double-buffered (4 copies of rb*S*LW f32),
# against the kernels' 110 MB vmem_limit minus resident x and spill room
_WINDOW_VMEM_BUDGET = 96 * 1024 * 1024


def cwell_spmv_pallas(A: CWELL, x: jax.Array, rb: int | None = None):
    """Pallas CWELL SpMV; returns None to signal fallback.

    bf16 matrices run natively (vals stream at 2 B/slot, f32 gather and
    accumulate, result cast to the operands' result dtype); f64 goes
    through cwell_spmv_pallas_df.
    """
    if not _HAS_PALLAS:
        return None
    n, m = A.shape
    if A.vals.dtype not in (jnp.float32, jnp.bfloat16):
        return None  # f64 → cwell_spmv_pallas_df
    out_dtype = jnp.result_type(A.vals.dtype, x.dtype)
    if out_dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    if m_pad > _X_VMEM_LIMIT:
        return None
    if A.planes % 8 != 0:
        return None
    rb_eff = rb if rb is not None else _pick_rb(A.planes)
    if 4 * rb_eff * A.planes * LW * 4 > _WINDOW_VMEM_BUDGET:
        return None  # plane-rich beyond VMEM even at rb=1 → XLA path
    y = _cwell_spmv_impl(A.vals, A.idx2, A.srow, x, shape=A.shape,
                         rb=rb_eff,
                         group=getattr(A, "group", 1),
                         unroll_cap=getattr(A, "unroll_cap", None))
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Double-f32 (compensated) CWELL SpMV: fast f64 for general structure
# ---------------------------------------------------------------------------
#
# The f64 analogue the DIA path already has (ExtendedStencilOperatorDF,
# pallas_spmv.py): every f64 value is an unevaluated hi+lo f32 pair, and
# y = Σ v·x(col) is computed with Dekker twoProd / Knuth twoSum error-free
# transforms in native-f32 VPU ops — including the final cross-sublane
# reduction, which is itself compensated so the ~2^-45 relative accuracy
# survives the (8, 128) → (128,) fold. Gathers are permutations and
# therefore exact on the hi/lo pair streams.


def _cwell_kernel_df(srow_ref, xh2d_ref, xl2d_ref, valsh_ref, valsl_ref,
                     idx2_ref, y_ref, xw, *, RB, S):
    """xw: (4*8, 128) scratch — [0:8]=xh[r], [8:16]=xh[r+1], [16:24]=xl[r],
    [24:32]=xl[r+1] for the group's 8 planes. y_ref: (RB, 2, 128) [sum;
    compensation] f32 pairs, combined to f64 by the caller."""
    from tpu_sparse.kernels.pallas_spmv import _two_prod, _two_sum

    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    G = S // 8

    def g_body(g, carry):
        rb, s_acc, c_acc = carry
        base = lax_.mul(g, i32(8))
        for s in range(8):
            r = srow_ref[0, rb, lax_.add(base, i32(s))]
            rp1 = lax_.add(r, i32(1))
            xw[s, :] = xh2d_ref[r, :]
            xw[8 + s, :] = xh2d_ref[rp1, :]
            xw[16 + s, :] = xl2d_ref[r, :]
            xw[24 + s, :] = xl2d_ref[rp1, :]
        idx = idx2_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        il = jnp.minimum(idx, 127)
        ih = jnp.clip(idx - 128, 0, 127)
        sel = idx < 128
        xh = jnp.where(sel,
                       jnp.take_along_axis(xw[0:8, :], il, axis=1),
                       jnp.take_along_axis(xw[8:16, :], ih, axis=1))
        xl = jnp.where(sel,
                       jnp.take_along_axis(xw[16:24, :], il, axis=1),
                       jnp.take_along_axis(xw[24:32, :], ih, axis=1))
        vh = valsh_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        vl = valsl_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        p, e = _two_prod(vh, xh)
        e = e + vh * xl + vl * xh
        s_acc, es = _two_sum(s_acc, p)
        c_acc = c_acc + es + e
        return rb, s_acc, c_acc

    def rb_body(rb, _):
        z = jnp.zeros((8, LW), jnp.float32)
        _, s_acc, c_acc = lax_.fori_loop(0, G, g_body, (rb, z, z),
                                         unroll=G if G <= 384 else 1)
        # compensated cross-sublane fold (a plain f32 sum here would
        # reintroduce f32 rounding and waste the twoSum work above)
        st = s_acc[0, :]
        ct = c_acc[0, :]
        for i in range(1, 8):
            st, e = _two_sum(st, s_acc[i, :])
            ct = ct + e + c_acc[i, :]
        y_ref[rb, 0, :] = st
        y_ref[rb, 1, :] = ct
        return 0

    lax_.fori_loop(0, RB, rb_body, 0, unroll=RB)


def _cwell_kernel_df_gq(srowq_ref, xh2d_ref, xl2d_ref, valsh_ref,
                        valsl_ref, idx2_ref, y_ref, *, RB, S, Q):
    """Grouped-plane DF variant: 4*(8/Q) dynamic x-row reads per 8-plane
    group (vs 32 in _cwell_kernel_df); srowq_ref is (1, RB, S//Q) SMEM."""
    from tpu_sparse.kernels.pallas_spmv import _two_prod, _two_sum

    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    G = S // 8

    def g_body(g, carry):
        rb, s_acc, c_acc = carry
        (xh_lo, xh_hi), (xl_lo, xl_hi) = _gq_window_sources(
            srowq_ref, rb, g, [xh2d_ref, xl2d_ref], Q)
        idx = idx2_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        il = jnp.minimum(idx, 127)
        ih = jnp.clip(idx - 128, 0, 127)
        sel = idx < 128
        xh = jnp.where(sel, jnp.take_along_axis(xh_lo, il, axis=1),
                       jnp.take_along_axis(xh_hi, ih, axis=1))
        xl = jnp.where(sel, jnp.take_along_axis(xl_lo, il, axis=1),
                       jnp.take_along_axis(xl_hi, ih, axis=1))
        vh = valsh_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        vl = valsl_ref[rb, pl.ds(lax_.mul(g, i32(8)), 8), :]
        p, e = _two_prod(vh, xh)
        e = e + vh * xl + vl * xh
        s_acc, es = _two_sum(s_acc, p)
        c_acc = c_acc + es + e
        return rb, s_acc, c_acc

    def rb_body(rb, _):
        z = jnp.zeros((8, LW), jnp.float32)
        _, s_acc, c_acc = lax_.fori_loop(0, G, g_body, (rb, z, z),
                                         unroll=G if G <= 384 else 1)
        st = s_acc[0, :]
        ct = c_acc[0, :]
        for i in range(1, 8):
            st, e = _two_sum(st, s_acc[i, :])
            ct = ct + e + c_acc[i, :]
        y_ref[rb, 0, :] = st
        y_ref[rb, 1, :] = ct
        return 0

    lax_.fori_loop(0, RB, rb_body, 0, unroll=RB)


@functools.partial(jax.jit, static_argnames=("shape", "rb", "group"))
def _cwell_spmv_df_impl(valsh, valsl, idx2, srow, x, *, shape, rb,
                        group=1):
    # split x into a hi/lo pair in f64 mode, trace the kernel in 32-bit
    # mode, recombine in f64 mode.
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
    with jax.enable_x64(False):
        y2 = _cwell_df_inner(valsh, valsl, idx2, srow, xh, xl,
                             shape=shape, rb=rb, group=group)
    n = shape[0]
    ys = y2[:, 0, :].reshape(-1)[:n]
    yc = y2[:, 1, :].reshape(-1)[:n]
    return ys.astype(jnp.float64) + yc.astype(jnp.float64)


def _cwell_df_inner(valsh, valsl, idx2, srow, xh, xl, *, shape, rb,
                    group=1):
    grouped = group > 1
    nb, S, _ = valsh.shape
    n, m = shape
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    xh2d = jnp.pad(xh, (0, m_pad - m)).reshape(-1, LW)
    xl2d = jnp.pad(xl, (0, m_pad - m)).reshape(-1, LW)
    grid = (nb + rb - 1) // rb
    nb_pad = grid * rb
    if grouped:
        srow = srow[:, ::group]  # per-run window row (uniform within runs)
    if nb_pad != nb:
        valsh = jnp.pad(valsh, ((0, nb_pad - nb), (0, 0), (0, 0)))
        valsl = jnp.pad(valsl, ((0, nb_pad - nb), (0, 0), (0, 0)))
        idx2 = jnp.pad(idx2, ((0, nb_pad - nb), (0, 0), (0, 0)))
        srow = jnp.pad(srow, ((0, nb_pad - nb), (0, 0)))
    srow3 = srow.reshape(grid, rb, srow.shape[1])

    kernel = (functools.partial(_cwell_kernel_df_gq, RB=rb, S=S, Q=group)
              if grouped else
              functools.partial(_cwell_kernel_df, RB=rb, S=S))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb_pad, 2, LW), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, rb, srow.shape[1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xh2d resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xl2d resident
            pl.BlockSpec((rb, S, LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, LW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 2, LW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[] if grouped else [
            pltpu.VMEM((32, LW), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 20 * nb_pad * S * LW,
            bytes_accessed=nb_pad * S * LW * 12 + 2 * (m_pad
                                                       + nb_pad * LW) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(srow3, xh2d, xl2d, valsh, valsl, idx2)


# ---------------------------------------------------------------------------
# CWELL SpMM (multi-RHS): per-plane one-hot matmuls on the MXU
# ---------------------------------------------------------------------------
#
# For SpMV the one-hot/slab approach measured 2.3x SLOWER than lane
# gathers (ROADMAP perf item 2 dead-end list) — the (128, 256) one-hot
# build cost isn't amortized by one output vector. With k RHS columns the
# same one-hot feeds a (128,256)@(256,k) MXU matmul, so the build cost is
# shared k ways and the FLOP overhead is only 2/fill vs the nonzeros.
# B stays VMEM-resident in (KT, m) TRANSPOSED column tiles (grid dim 0),
# row blocks stream as grid dim 1. The transpose puts m on the lane axis:
# a (m, KT) resident tile would lane-pad KT to 128 and cost m·128·4 B of
# VMEM no matter how small KT is (measured: 128 MB — the whole chip — at
# m=262144, OOM), while (KT, m) costs KT·m·4 B and the KT budget loop
# below actually works. Window selection becomes a lane-axis dynamic
# slice at 128-aligned offsets, which Mosaic supports.

# B-tile budget: 48 MB f32 (of 128 MB VMEM). Headroom matters: Mosaic may
# double-buffer the grid-j-varying B block, so an exact 64 MB budget under
# a 110 MB vmem_limit can fail to compile at kt=64 (unexercised on chip).
_B_VMEM_ELEMS = 12 * 1024 * 1024


def _cwell_spmm_kernel(srow_ref, b2d_ref, vals_ref, idx2_ref, y_ref,
                       *, RB, S, KT):
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731

    col = lax_.broadcasted_iota(jnp.int32, (LW, 2 * LW), 1)

    def s_body(s, carry):
        rb, acc = carry
        sr = srow_ref[0, rb, s]
        Bwin = b2d_ref[:, pl.ds(lax_.mul(sr, i32(LW)), 2 * LW)]  # (KT, 256)
        idx = idx2_ref[rb, s, :]            # (128,)
        v = vals_ref[rb, s, :]
        P = jnp.where(col == idx[:, None], v[:, None],
                      jnp.zeros((), jnp.float32))
        acc = acc + lax_.dot_general(
            P, Bwin, (((1,), (1,)), ((), ())),
            precision=lax_.Precision.HIGHEST,  # full-f32 MXU passes:
            # default (bf16 multipliers) measured 2.9e-3 rel on chip
            preferred_element_type=jnp.float32)
        return rb, acc

    def rb_body(rb, _):
        acc = jnp.zeros((LW, KT), jnp.float32)
        _, acc = lax_.fori_loop(0, S, s_body, (rb, acc), unroll=S)
        y_ref[rb, :, :] = acc
        return 0

    lax_.fori_loop(0, RB, rb_body, 0, unroll=RB)


def _cwell_spmm_kernel_gq(srowq_ref, b2d_ref, vals_ref, idx2_ref, y_ref,
                          *, RB, S, KT, Q):
    """Grouped-plane SpMM: the Q planes of a run share one B window, and
    because matmul is linear their one-hot matrices MERGE —
    sum_q (P_q @ Bwin) = (sum_q P_q) @ Bwin — so the MXU matmul count
    drops Q-fold (the 2/fill FLOP overhead was the kernel's bound) at the
    cost of Q cheap VPU select-adds per run. Within a run a row's nonzero
    columns are distinct, so the merged one-hot has no collisions."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    R = S // Q

    col = lax_.broadcasted_iota(jnp.int32, (LW, 2 * LW), 1)

    def t_body(t, carry):
        rb, acc = carry
        sr = srowq_ref[0, rb, t]
        Bwin = b2d_ref[:, pl.ds(lax_.mul(sr, i32(LW)), 2 * LW)]  # (KT, 256)
        P = jnp.zeros((LW, 2 * LW), jnp.float32)
        base = lax_.mul(t, i32(Q))
        for q in range(Q):
            s = lax_.add(base, i32(q))
            idx = idx2_ref[rb, s, :]            # (128,)
            v = vals_ref[rb, s, :]
            P = P + jnp.where(col == idx[:, None], v[:, None],
                              jnp.zeros((), jnp.float32))
        acc = acc + lax_.dot_general(
            P, Bwin, (((1,), (1,)), ((), ())),
            precision=lax_.Precision.HIGHEST,  # full-f32 MXU passes:
            # default (bf16 multipliers) measured 2.9e-3 rel on chip
            preferred_element_type=jnp.float32)
        return rb, acc

    def rb_body(rb, _):
        acc = jnp.zeros((LW, KT), jnp.float32)
        _, acc = lax_.fori_loop(0, R, t_body, (rb, acc), unroll=R)
        y_ref[rb, :, :] = acc
        return 0

    lax_.fori_loop(0, RB, rb_body, 0, unroll=RB)


@functools.partial(jax.jit, static_argnames=("shape", "rb", "kt", "group"))
def _cwell_spmm_impl(vals, idx2, srow, B, *, shape, rb, kt, group=1):
    with jax.enable_x64(False):
        return _cwell_spmm_inner(vals, idx2, srow, B, shape=shape, rb=rb,
                                 kt=kt, group=group)


def _cwell_spmm_inner(vals, idx2, srow, B, *, shape, rb, kt, group=1):
    grouped = group > 1
    nb, S, _ = vals.shape
    n, m = shape
    k = B.shape[1]
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    k_pad = ((k + kt - 1) // kt) * kt
    # transposed resident layout: lanes = m (fully used), sublanes = kt
    B2d = jnp.pad(B, ((0, m_pad - m), (0, k_pad - k))).T
    grid_i = (nb + rb - 1) // rb
    nb_pad = grid_i * rb
    if grouped:
        srow = srow[:, ::group]  # per-run window row
    if nb_pad != nb:
        vals = jnp.pad(vals, ((0, nb_pad - nb), (0, 0), (0, 0)))
        idx2 = jnp.pad(idx2, ((0, nb_pad - nb), (0, 0), (0, 0)))
        srow = jnp.pad(srow, ((0, nb_pad - nb), (0, 0)))
    srow3 = srow.reshape(grid_i, rb, srow.shape[1])
    grid_j = k_pad // kt

    kernel = (functools.partial(_cwell_spmm_kernel_gq, RB=rb, S=S, KT=kt,
                                Q=group)
              if grouped else
              functools.partial(_cwell_spmm_kernel, RB=rb, S=S, KT=kt))
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb_pad, LW, k_pad), jnp.float32),
        grid=(grid_j, grid_i),  # j outer: B tile loads once per sweep
        in_specs=[
            pl.BlockSpec((1, rb, srow.shape[1]), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kt, m_pad // LW * LW), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, LW), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, LW), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, LW, kt), lambda j, i: (i, 0, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb_pad * S * LW * 2 * LW * k_pad,
            bytes_accessed=(nb_pad * S * LW * 8 * grid_j
                            + m_pad * k_pad * 4 + nb_pad * LW * k_pad * 4),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(srow3, B2d, vals, idx2)
    return y.reshape(nb_pad * LW, k_pad)[:n, :k]


def _cwell_spmm_gather_kernel(srowq_ref, b2d_ref, vals_ref, idx2_ref,
                              y_ref, *, RB, S, KT, Q):
    """Gather-contraction SpMM (r4): instead of building a (128, 256)
    one-hot per run and contracting on the MXU, lane-gather the (KT, 128)
    B slab each plane needs and multiply-accumulate on the VPU — the
    same gather primitive as the SpMV kernel, amortized k ways (the
    scalar srow reads and window slices are shared by all KT columns).
    The one-hot kernel's bound was the 2/fill FLOP overhead of the dense
    one-hot matmuls; the gather form does exactly nnz·KT useful MACs.
    acc layout is (KT, LW): output columns on sublanes, rows on lanes —
    transposed once outside the kernel."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    R = S // Q

    def t_body(t, carry):
        rb, acc = carry
        sr = srowq_ref[0, rb, t]
        blo = b2d_ref[:, pl.ds(lax_.mul(sr, i32(LW)), LW)]       # (KT,128)
        bhi = b2d_ref[:, pl.ds(lax_.mul(lax_.add(sr, i32(1)),
                                        i32(LW)), LW)]           # (KT,128)
        base = lax_.mul(t, i32(Q))
        for q in range(Q):
            s = lax_.add(base, i32(q))
            idx = idx2_ref[rb, s, :]                             # (128,)
            idxb = jnp.broadcast_to(idx[None, :], (KT, LW))
            lo = jnp.take_along_axis(blo, jnp.minimum(idxb, 127), axis=1)
            hi = jnp.take_along_axis(bhi, jnp.clip(idxb - 128, 0, 127),
                                     axis=1)
            g = jnp.where(idxb < 128, lo, hi)
            v = vals_ref[rb, s, :]
            acc = acc + v[None, :] * g
        return rb, acc

    def rb_body(rb, _):
        acc = jnp.zeros((KT, LW), jnp.float32)
        _, acc = lax_.fori_loop(0, R, t_body, (rb, acc),
                                unroll=R if R <= 384 else 1)
        y_ref[rb, :, :] = acc
        return 0

    lax_.fori_loop(0, RB, rb_body, 0, unroll=RB)


@functools.partial(jax.jit, static_argnames=("shape", "rb", "kt", "group"))
def _cwell_spmm_gather_impl(vals, idx2, srow, B, *, shape, rb, kt,
                            group=1):
    with jax.enable_x64(False):
        nb, S, _ = vals.shape
        n, m = shape
        k = B.shape[1]
        m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
        k_pad = ((k + kt - 1) // kt) * kt
        B2d = jnp.pad(B, ((0, m_pad - m), (0, k_pad - k))).T
        grid_i = (nb + rb - 1) // rb
        nb_pad = grid_i * rb
        if group > 1:
            srow = srow[:, ::group]
        if nb_pad != nb:
            vals = jnp.pad(vals, ((0, nb_pad - nb), (0, 0), (0, 0)))
            idx2 = jnp.pad(idx2, ((0, nb_pad - nb), (0, 0), (0, 0)))
            srow = jnp.pad(srow, ((0, nb_pad - nb), (0, 0)))
        srow3 = srow.reshape(grid_i, rb, srow.shape[1])
        grid_j = k_pad // kt

        kernel = functools.partial(_cwell_spmm_gather_kernel, RB=rb, S=S,
                                   KT=kt, Q=max(group, 1))
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb_pad, k_pad, LW),
                                           jnp.float32),
            grid=(grid_j, grid_i),
            in_specs=[
                pl.BlockSpec((1, rb, srow.shape[1]),
                             lambda j, i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kt, m_pad // LW * LW), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, S, LW), lambda j, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, S, LW), lambda j, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, kt, LW), lambda j, i: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * nb_pad * S * LW * k_pad,
                bytes_accessed=(nb_pad * S * LW * 8 * grid_j
                                + m_pad * k_pad * 4
                                + nb_pad * LW * k_pad * 4),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=_INTERPRET,
        )(srow3, B2d, vals, idx2)
        # (nb, k, LW) -> (n, k)
        return jnp.transpose(y, (0, 2, 1)).reshape(
            nb_pad * LW, k_pad)[:n, :k]


def cwell_spmm_pallas_gather(A: CWELL, B: jax.Array,
                             rb: int | None = None):
    """Gather-contraction SpMM variant; None signals unsupported."""
    if not _HAS_PALLAS:
        return None
    n, m = A.shape
    k = B.shape[1]
    if A.vals.dtype != jnp.float32:
        return None
    if jnp.result_type(A.vals.dtype, B.dtype) not in (jnp.float32,
                                                      jnp.bfloat16):
        return None
    if B.dtype != jnp.float32:
        B = B.astype(jnp.float32)
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    kt = 128
    while kt > 8 and m_pad * kt > _B_VMEM_ELEMS:
        kt //= 2
    if m_pad * kt > _B_VMEM_ELEMS:
        return None
    kt = min(kt, max(8, ((k + 7) // 8) * 8))
    group = getattr(A, "group", 1)
    if group > 1 and A.planes % group != 0:
        return None
    if A.planes // max(group, 1) > 384:
        return None  # unroll cap (same class as the SpMV kernel's)
    rb_eff = rb if rb is not None else (
        16 if 4 * 16 * A.planes * LW * 4 <= _WINDOW_VMEM_BUDGET else 8)
    if k > kt:
        outs = [
            _cwell_spmm_gather_impl(
                A.vals, A.idx2, A.srow,
                jax.lax.slice_in_dim(B, j, min(j + kt, k), axis=1),
                shape=A.shape, rb=rb_eff, kt=kt, group=group)
            for j in range(0, k, kt)
        ]
        return jnp.concatenate(outs, axis=1)
    return _cwell_spmm_gather_impl(A.vals, A.idx2, A.srow, B,
                                   shape=A.shape, rb=rb_eff, kt=kt,
                                   group=group)


def cwell_spmm_pallas(A: CWELL, B: jax.Array, rb: int | None = None):
    """Pallas CWELL SpMM (Y = A @ B, dense B); None signals fallback.

    Dispatch (r4): the gather-contraction kernel is the primary path —
    measured 77.5 Gnnz/s at k=32 on the 27-pt pack vs 16.6 for the
    one-hot MXU kernel (the ROADMAP r3 "one-hot-free contraction" item:
    the one-hot's 2/fill dense-matmul FLOP overhead was its bound, while
    the lane gathers amortize window reads across all k columns); the
    one-hot kernel remains as fallback for packs the gather's unroll cap
    rejects."""
    y = cwell_spmm_pallas_gather(A, B, rb=rb)
    if y is not None:
        return y
    if not _HAS_PALLAS:
        return None
    n, m = A.shape
    k = B.shape[1]
    if A.vals.dtype != jnp.float32:
        return None
    if jnp.result_type(A.vals.dtype, B.dtype) not in (jnp.float32,
                                                      jnp.bfloat16):
        return None  # f64/complex B keeps the full-precision XLA path
    if B.dtype != jnp.float32:
        B = B.astype(jnp.float32)
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    # pick the widest k tile that keeps the resident B tile in budget
    kt = 128
    while kt > 8 and m_pad * kt > _B_VMEM_ELEMS:
        kt //= 2
    if m_pad * kt > _B_VMEM_ELEMS:
        return None
    kt = min(kt, max(8, ((k + 7) // 8) * 8))
    group = getattr(A, "group", 1)
    if group > 1 and A.planes % group != 0:
        return None  # run loop would silently drop trailing planes
    runs = A.planes // group  # MXU matmuls per block (merged per run)
    if runs > 64:
        return None  # unrolled matmul chain gets too long
    rb_eff = rb if rb is not None else (2 if runs > 16 else 4)
    if k > kt:
        # Mosaic requires the k-block to be 128-divisible or equal to the
        # full array dim; for k past the VMEM kt budget, solve kt-wide
        # column slabs so each call sees a full-width (legal) block
        # (r3 on-chip finding: k=128 at m=262144 failed lowering).
        outs = [
            _cwell_spmm_impl(A.vals, A.idx2, A.srow,
                             jax.lax.slice_in_dim(B, j, min(j + kt, k),
                                                  axis=1),
                             shape=A.shape, rb=rb_eff, kt=kt, group=group)
            for j in range(0, k, kt)
        ]
        return jnp.concatenate(outs, axis=1)
    return _cwell_spmm_impl(A.vals, A.idx2, A.srow, B, shape=A.shape,
                            rb=rb_eff, kt=kt, group=group)


from tpu_sparse.utils.opcache import OperandCache  # noqa: E402

_df_split_cache = OperandCache(max_entries=16)


def _split_df(vals):
    vh = vals.astype(jnp.float32)
    vl = (vals - vh.astype(jnp.float64)).astype(jnp.float32)
    return vh, vl


def _cached_df_split(A: CWELL):
    """hi/lo f32 split of f64 CWELL vals, cached per matrix content."""
    return _df_split_cache.get_or_build(A, lambda: _split_df(A.vals))


def cwell_spmv_pallas_df(A: CWELL, x: jax.Array, rb: int | None = None):
    """Double-f32 compensated CWELL SpMV for f64 matrices; None to signal
    fallback. Accuracy ~2^-45 relative (same class as the DIA DF kernel);
    documented as compensated-f32 rather than true f64."""
    if not _HAS_PALLAS:
        return None
    n, m = A.shape
    if A.vals.dtype != jnp.float64 or x.dtype != jnp.float64:
        return None
    m_pad = max(((m + LW - 1) // LW) * LW, 2 * LW)
    if 2 * m_pad > _X_VMEM_LIMIT:  # hi+lo both VMEM-resident
        return None
    if A.planes % 8 != 0:
        return None
    rb_eff = rb if rb is not None else _pick_rb(A.planes)
    # three streamed windows here (valsh, valsl, idx2), double-buffered
    if 6 * rb_eff * A.planes * LW * 4 > _WINDOW_VMEM_BUDGET:
        return None
    if isinstance(A.vals, jax.core.Tracer):
        vh, vl = _split_df(A.vals)
    else:
        vh, vl = _cached_df_split(A)
    return _cwell_spmv_df_impl(vh, vl, A.idx2, A.srow, x, shape=A.shape,
                               rb=rb_eff,
                               group=getattr(A, "group", 1))
