"""Pallas TPU SpMV kernels.

`dia_spmv_pallas` — stencil (DIA) SpMV targeting HBM speed-of-light. The
matrix is (ndiag, n) diagonal data; the kernel streams row-chunks of every
diagonal through VMEM (auto double-buffered by the Pallas grid pipeline)
while **manually double-buffering** the matching x windows (chunk +
bandwidth halos) from HBM, so the x DMA for chunk i+1 overlaps chunk i's
compute. All diagonal shifts are static slices into the VMEM x window —
zero gathers, pure VPU multiply-accumulate: bytes ≈ 4·(nnz + 2n).

Replaces the capability of torch.sparse/cuSPARSE SpMV in the reference
(SURVEY.md §2.2); the XLA segment-sum path in kernels/reference.py remains
the general-format fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from tpu_sparse.sparse.containers import BSR, DIA

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Test hook: run kernels in the Pallas interpreter (CPU) so kernel logic is
# exercised in CI without TPU hardware.
_INTERPRET = False

# Chunk sizing shared by both DIA kernels: double-buffered (ndiag, C) data
# blocks must fit the pipeline budget; larger chunks amortize the halo
# window DMA and issue fewer, longer DMAs. TPU sweep on the 27-pt n=128³
# system: C=32K → 148 Gnnz/s, 64K → 154, 128K → 162 (723 GB/s, 0.88 of
# HBM speed-of-light), 256K → 131 (pipeline buffers crowd VMEM).
_PIPELINE_VMEM_BUDGET = 32 * 1024 * 1024
_CHUNK_CAP = 128 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dia_kernel(xp_hbm, data_ref, y_ref, xa, xb, sems, *, offsets, w, C, W,
                grid):
    """xa/xb: (W,) double buffers (two separate scratch refs — Mosaic cannot
    slice the leading axis of a (2, W) 1-D-tiled buffer); sems: 2 DMA
    semaphores. The DMA for chunk i+1 is issued before chunk i's compute."""
    # All index math through lax with explicit int32 constants: the jnp
    # operator path (promotion machinery) infinitely recurses when tracing
    # Mosaic kernels under jax_enable_x64.
    lax_ = jax.lax
    i = pl.program_id(0)
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    ip1 = lax_.add(i, i32(1))
    parity = lax_.rem(i, i32(2))
    parity_n = lax_.rem(ip1, i32(2))
    has_next = lax_.lt(ip1, i32(grid))

    def x_dma(step, buf, slot):
        # int32 semaphore index: a Python int would lower as i64 under x64
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(lax_.mul(step, i32(C)), W)], buf,
            sems.at[i32(slot)])

    @pl.when(lax_.eq(i, i32(0)))
    def _():
        x_dma(i32(0), xa, 0).start()

    @pl.when(lax_.bitwise_and(has_next, lax_.eq(parity_n, i32(0))))
    def _():
        x_dma(ip1, xa, 0).start()

    @pl.when(lax_.bitwise_and(has_next, lax_.eq(parity_n, i32(1))))
    def _():
        x_dma(ip1, xb, 1).start()

    def compute(buf):
        acc = None
        for d, o in enumerate(offsets):
            seg = buf[w + o : w + o + C]  # static shift slices
            row = data_ref[d, :]
            if row.dtype != seg.dtype:
                row = row.astype(seg.dtype)
            term = row * seg
            acc = term if acc is None else acc + term
        y_ref[:] = acc

    @pl.when(lax_.eq(parity, i32(0)))
    def _():
        x_dma(i, xa, 0).wait()
        compute(xa)

    @pl.when(lax_.eq(parity, i32(1)))
    def _():
        x_dma(i, xb, 1).wait()
        compute(xb)


@functools.partial(jax.jit, static_argnames=("offsets", "shape"))
def _dia_spmv_pallas_impl(data, x, *, offsets, shape):
    # Mosaic kernels must be traced with 32-bit index semantics; under
    # jax_enable_x64 the Python-int constants in the kernel lower as i64 and
    # break legalization (and the jnp promotion path can even recurse).
    # The operands are f32, so 32-bit trace mode is value-preserving here.
    with jax.enable_x64(False):
        return _dia_spmv_pallas_impl_inner(data, x, offsets=offsets,
                                           shape=shape)


def _dia_spmv_pallas_impl_inner(data, x, *, offsets, shape):
    n = shape[0]
    w = max(max(abs(o) for o in offsets), 1)
    ndiag = len(offsets)
    dtype = jnp.result_type(data, x)

    # Chunk size: multiple of 1024; prefer a divisor of n (skips the data
    # pad, which would otherwise re-run every solver iteration); cap the
    # pipelined 2 × ndiag × C × 4B data blocks at the shared budget (see
    # the sweep note above _PIPELINE_VMEM_BUDGET).
    max_c = max(1024, _PIPELINE_VMEM_BUDGET // (2 * 4 * max(ndiag, 1))
                // 1024 * 1024)
    C = min(_round_up(n, 1024), max_c, _CHUNK_CAP)
    if n % 1024 == 0:
        while C > 1024 and n % C != 0:
            C -= 1024
    n_pad = _round_up(n, C)
    grid = n_pad // C
    # Mosaic needs 1-D DMA slices aligned to the 1024-element tiling.
    W = _round_up(C + 2 * w, 1024)

    xp = jnp.pad(x, (w, (n_pad - C + W) - n - w))
    data_p = (data if n_pad == n
              else jnp.pad(data, ((0, 0), (0, n_pad - n))))

    kernel = functools.partial(_dia_kernel, offsets=offsets, w=w, C=C, W=W,
                               grid=grid)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xp stays in HBM
            pl.BlockSpec((ndiag, C), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W,), dtype),
            pltpu.VMEM((W,), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n,
            bytes_accessed=(ndiag + 2) * n_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xp, data_p)
    return y[:n]


def dia_spmv_pallas(A: DIA, x: jax.Array):
    """Pallas DIA SpMV; returns None to signal fallback when unsupported."""
    if not _HAS_PALLAS:
        return None
    if not A.offsets:
        return None
    n, m = A.shape
    if n != m:
        return None  # rectangular stencils go through the XLA path
    if A.data.dtype not in (jnp.float32, jnp.bfloat16) or \
            x.dtype not in (jnp.float32, jnp.bfloat16):
        return None  # f64/complex stay on the XLA path
    if A.data.dtype != x.dtype:
        # The VMEM x double buffers are allocated at the result dtype;
        # mismatched HBM source dtype would fail the async copy at compile
        # time. Cast x up front (result_type covers both operands).
        x = x.astype(jnp.result_type(A.data.dtype, x.dtype))
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        if A.data.dtype != x.dtype:
            A = A.with_data(A.data.astype(x.dtype))
    w = max(abs(o) for o in A.offsets)
    if w >= n:
        return None
    return _dia_spmv_pallas_impl(A.data, x, offsets=A.offsets, shape=A.shape)


def bsr_spmv_pallas(A: BSR, x: jax.Array):
    """BSR SpMV through the CWELL Pallas kernel.

    Dense bs×bs blocks pack into CWELL at ~100% fill (each block is a
    perfectly windowed run of columns), so the general column-window
    kernel IS the block kernel for SpMV. The host-side repack is cached
    per matrix object; under jit (traced data) it cannot run — promote
    block operators with `sparse.optimize.to_tpu_operator` before jit to
    get the fast path inside compiled solvers."""
    if not _HAS_PALLAS:
        return None
    if isinstance(A.data, jax.core.Tracer) or \
            isinstance(x, jax.core.Tracer):
        return None
    W = _cached_cwell_of_block(A)
    if W is None:
        return None
    from tpu_sparse.kernels.pallas_cwell import cwell_spmv_pallas

    return cwell_spmv_pallas(W, x)


_block_cwell_cache: dict = {}


def _cached_cwell_of_block(A):
    """CWELL repack of a BSR/BELL matrix, cached per live matrix object."""
    import weakref

    from tpu_sparse.sparse.cwell import csr_to_cwell

    entry = _block_cwell_cache.get(id(A))
    if entry is not None and entry[0]() is A:
        return entry[1]
    import numpy as np

    try:
        if isinstance(A, BSR):
            csr = A.tocoo().tocsr()
        else:  # BELL: expand blocks to COO on host, dropping padding zeros
            from tpu_sparse.sparse.containers import COO

            bl = np.asarray(A.blocks)
            bidx = np.asarray(A.indices)
            nbr, L, bs, _ = bl.shape
            rows = (np.arange(nbr)[:, None, None, None] * bs
                    + np.arange(bs)[None, None, :, None])
            cols = (bidx[:, :, None, None] * bs
                    + np.arange(bs)[None, None, None, :])
            rows = np.broadcast_to(rows, bl.shape)
            cols = np.broadcast_to(cols, bl.shape)
            mask = bl != 0
            csr = COO(jnp.asarray(bl[mask]),
                      jnp.asarray(rows[mask].astype(np.int32)),
                      jnp.asarray(cols[mask].astype(np.int32)),
                      A.shape).tocsr()
        W = csr_to_cwell(csr)
    except Exception:
        W = None
    if len(_block_cwell_cache) > 16:
        _block_cwell_cache.clear()
    try:
        _block_cwell_cache[id(A)] = (weakref.ref(A), W)
    except TypeError:
        return W
    return W


# ---------------------------------------------------------------------------
# Extended-space stencil operator: zero-copy SpMV
# ---------------------------------------------------------------------------

#
# The plain kernel pads x and slices y every call (up to ~40% extra HBM
# traffic for narrow stencils). The extended operator keeps every solver
# vector in a halo-extended layout [0…0 | x | 0…0] whose margins stay zero
# under all Krylov vector ops, so SpMV is pad-free and slice-free:
# extend(b) once at solve entry, extract(x) once at exit.


def _dia_ext_kernel(x_hbm, data_ref, y_ref, xa, xb, sems, *, offsets, H, C,
                    W, grid, lo_chunks, hi_chunk):
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    j = pl.program_id(0)
    is_margin = lax_.bitwise_or(lax_.lt(j, i32(lo_chunks)),
                                lax_.ge(j, i32(hi_chunk)))
    jp1 = lax_.add(j, i32(1))
    parity = lax_.rem(j, i32(2))
    parity_n = lax_.rem(jp1, i32(2))
    has_next = lax_.lt(jp1, i32(grid))

    E = grid * C

    def x_dma(step, buf, slot):
        # Interior windows [step*C - H, step*C + C + H) are in bounds by
        # construction (H <= Wl); margin chunks clamp to a valid aligned
        # window — their output is zeroed so the content is irrelevant.
        start = lax_.sub(lax_.mul(step, i32(C)), i32(H))
        start = lax_.clamp(i32(0), start, i32(E - W))
        # C, H, E, W are all multiples of 1024 — tell Mosaic, whose
        # divisibility analysis cannot see through the clamp.
        start = pl.multiple_of(start, 1024)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, W)], buf, sems.at[i32(slot)])

    @pl.when(lax_.eq(j, i32(0)))
    def _():
        x_dma(i32(0), xa, 0).start()

    @pl.when(lax_.bitwise_and(has_next, lax_.eq(parity_n, i32(0))))
    def _():
        x_dma(jp1, xa, 0).start()

    @pl.when(lax_.bitwise_and(has_next, lax_.eq(parity_n, i32(1))))
    def _():
        x_dma(jp1, xb, 1).start()

    def compute(buf):
        acc = None
        for d, o in enumerate(offsets):
            seg = buf[H + o : H + o + C]
            row = data_ref[d, :]
            if row.dtype != seg.dtype:
                row = row.astype(seg.dtype)
            term = row * seg
            acc = term if acc is None else acc + term
        y_ref[:] = jnp.where(is_margin, 0.0, acc)

    @pl.when(lax_.eq(parity, i32(0)))
    def _():
        x_dma(j, xa, 0).wait()
        compute(xa)

    @pl.when(lax_.eq(parity, i32(1)))
    def _():
        x_dma(j, xb, 1).wait()
        compute(xb)


@jax.tree_util.register_pytree_node_class
class ExtendedStencilOperator:
    """Pad-free Pallas DIA SpMV on halo-extended vectors.

    Layout: extended length E = Wl + n_pad + Wl with Wl = roundup(w, C);
    the value region is [Wl, Wl + n). Margins are written to zero by the
    kernel itself, so they remain zero through arbitrary axpy/scale ops.

    Registered as a pytree (leaf: the padded diagonal data) so it can pass
    through jit/vmap as a matrix-free operator argument.
    """

    def tree_flatten(self):
        aux = (self.n, self.C, self.n_pad, self.Wl, self.H, self.W,
               self.E, self.offsets, self.dtype)
        return (self.data_p,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n, obj.C, obj.n_pad, obj.Wl, obj.H, obj.W, obj.E,
         obj.offsets, obj.dtype) = aux
        obj.data_p = children[0]
        return obj

    def __init__(self, A: DIA, chunk: int | None = None):
        n, m = A.shape
        assert n == m
        offsets = A.offsets
        w = max(max(abs(o) for o in offsets), 1)
        ndiag = len(offsets)
        if chunk is not None:
            C = chunk
        else:
            max_c = max(1024, (_PIPELINE_VMEM_BUDGET)
                        // (2 * 4 * max(ndiag, 1)) // 1024 * 1024)
            C = min(_round_up(n, 1024), max_c, _CHUNK_CAP)
            if n % 1024 == 0:
                while C > 1024 and n % C != 0:
                    C -= 1024
        self.n = n
        self.C = C
        self.n_pad = _round_up(n, C)
        self.Wl = _round_up(w, C)
        self.H = _round_up(w, 1024)
        self.W = C + 2 * self.H
        self.E = self.Wl + self.n_pad + self.Wl
        self.offsets = offsets
        self.dtype = A.data.dtype
        # data padded once, on host, at operator construction
        self.data_p = (A.data if self.n_pad == n else
                       jnp.pad(A.data, ((0, 0), (0, self.n_pad - n))))

    def extend(self, v: jax.Array) -> jax.Array:
        return jnp.pad(v, (self.Wl, self.E - self.Wl - self.n))

    def extend_diag(self, d: jax.Array) -> jax.Array:
        """Extend a diagonal-scaling vector with ones. Applying dinv_ext*v
        to extended vectors keeps the zero margins zero, so diagonal
        preconditioners compose with the pad-free fast path."""
        return jnp.pad(d, (self.Wl, self.E - self.Wl - self.n),
                       constant_values=1.0)

    def extract(self, v_ext: jax.Array) -> jax.Array:
        return jax.lax.slice(v_ext, (self.Wl,), (self.Wl + self.n,))

    def __call__(self, x_ext: jax.Array) -> jax.Array:
        with jax.enable_x64(False):
            return self._apply(x_ext)

    def _apply(self, x_ext):
        C, H, W = self.C, self.H, self.W
        ndiag = len(self.offsets)
        lo_chunks = self.Wl // C
        grid = self.E // C
        hi_chunk = lo_chunks + self.n_pad // C
        kernel = functools.partial(
            _dia_ext_kernel, offsets=self.offsets, H=H, C=C, W=W,
            grid=grid, lo_chunks=lo_chunks, hi_chunk=hi_chunk)
        dtype = jnp.result_type(self.data_p, x_ext)

        def data_map(j):
            # interior chunk j reads data block j - lo_chunks; margins are
            # mapped to block 0 (their output is zeroed anyway).
            idx = jax.lax.max(
                jax.lax.sub(j, jnp.array(lo_chunks, jnp.int32)),
                jnp.array(0, jnp.int32))
            idx = jax.lax.min(
                idx, jnp.array(self.n_pad // C - 1, jnp.int32))
            return (0, idx)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((self.E,), dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((ndiag, C), data_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C,), lambda j: (j,),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W,), dtype),
                pltpu.VMEM((W,), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * ndiag * self.n,
                bytes_accessed=(ndiag + 2) * self.n_pad * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=_INTERPRET,
        )(x_ext, self.data_p)


def make_extended_operator(A: DIA):
    """Build (matvec, extend, extract) for pad-free stencil solves.

    Returns None when the extended kernel is unsupported (non-TPU, f64,
    rectangular, or bandwidth ≥ n).
    """
    if not _HAS_PALLAS:
        return None
    n, m = A.shape
    if n != m or not A.offsets:
        return None
    if A.data.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    w = max(abs(o) for o in A.offsets)
    if w >= n:
        return None
    return ExtendedStencilOperator(A)
