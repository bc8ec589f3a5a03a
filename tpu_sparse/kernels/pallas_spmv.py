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


from tpu_sparse.utils.opcache import OperandCache

_block_cwell_cache = OperandCache(max_entries=16)


def _cached_cwell_of_block(A):
    """CWELL repack of a BSR/BELL matrix, cached per matrix content."""
    from tpu_sparse.sparse.cwell import csr_to_cwell

    return _block_cwell_cache.get_or_build(A, lambda: _build_block_cwell(
        A, csr_to_cwell))


def _build_block_cwell(A, csr_to_cwell):
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
        from tpu_sparse.sparse.cwell import AUTO_GROUP

        W = csr_to_cwell(csr, group=AUTO_GROUP)
    except Exception:
        W = None
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


# x-resident variant: when the whole extended vector fits in VMEM, keep
# it resident and stream ONLY the diagonal data — no per-chunk x-window
# DMAs at all. Measured motivation (docs/performance.md): raw data
# streaming reaches ~1029 GB/s at C=32K while the full DMA-windowed
# kernel tops out at ~723 GB/s at C=128K — the x-window DMAs are what
# drags it off the roofline. Caps: x + y resident = 2·E·4 B.
_RESIDENT_E_CAP = 6 * 1024 * 1024   # elements (24 MB x + 24 MB y)
_RESIDENT_CHUNK = 64 * 1024         # on-chip sweep winner (round 2):
#   C=16K 133, C=32K 146-164, C=64K 172, C=128K 144 Gnnz/s (27-pt n=128³)
_RESIDENT_ENABLED = True            # kill switch (perf A/B, debugging)
_RESIDENT_PROBE: dict = {}          # {"f32"|"df": bool} — one-time results


def set_resident_enabled(flag: bool) -> None:
    """Runtime toggle for the x-resident extended kernels (A/B, debugging)."""
    global _RESIDENT_ENABLED
    _RESIDENT_ENABLED = bool(flag)
    _RESIDENT_PROBE.clear()


def _resident_ok(kind: str) -> bool:
    """One-time tiny compile+run probe of the resident kernel on this chip.

    The resident variant is newer than the DMA-windowed kernel; if Mosaic
    rejected it on some chip generation, every TPU stencil solve with
    E ≤ cap would raise instead of degrading — so library auto-selection
    must not pick it before one instance has demonstrably compiled and
    run. Interpret mode and non-TPU backends cannot hard-fail Mosaic and
    pass trivially. Probed once per process per kernel family.
    """
    got = _RESIDENT_PROBE.get(kind)
    if got is not None:
        return got
    if _INTERPRET or jax.default_backend() != "tpu":
        _RESIDENT_PROBE[kind] = True
        return True
    from tpu_sparse.sparse.containers import DIA
    try:
        n = 2048
        A = DIA(jnp.ones((3, n), jnp.float32), (-1, 0, 1), (n, n))
        cls = (ExtendedStencilOperatorDF if kind == "df"
               else ExtendedStencilOperator)
        op = cls(A, resident=True)
        jax.block_until_ready(op(op.extend(jnp.ones((n,), jnp.float32))))
        _RESIDENT_PROBE[kind] = True
    except Exception as e:  # Mosaic compile / runtime failure
        import warnings
        warnings.warn(
            f"x-resident extended kernel ({kind}) failed its probe on this "
            f"TPU; falling back to the DMA-windowed kernel: {str(e)[:200]}")
        _RESIDENT_PROBE[kind] = False
    return _RESIDENT_PROBE[kind]


def _dia_ext_kernel_res(x_ref, data_ref, y_ref, *, offsets, H, C,
                        lo_chunks, hi_chunk):
    """x_ref: (E,) fully VMEM-resident extended vector; data_ref:
    (ndiag, C) streamed block; y_ref: (C,) output block. Chunk j covers
    extended rows [j·C, j·C + C): y[r] = Σ_o d_o · x_ext[r + o], read as
    static shifted subslices of one aligned dynamic window."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    j = pl.program_id(0)
    is_margin = lax_.bitwise_or(lax_.lt(j, i32(lo_chunks)),
                                lax_.ge(j, i32(hi_chunk)))
    # window [j·C - H, j·C + C + H): in bounds for interior chunks
    # (H ≤ Wl = lo_chunks·C); margin chunks clamp (output zeroed).
    start = lax_.sub(lax_.mul(j, i32(C)), i32(H))
    start = lax_.clamp(i32(0), start,
                       i32(x_ref.shape[0] - (C + 2 * H)))
    start = pl.multiple_of(start, 1024)
    win = x_ref[pl.ds(start, C + 2 * H)]
    acc = None
    for d, o in enumerate(offsets):
        seg = win[H + o: H + o + C]
        row = data_ref[d, :]
        if row.dtype != seg.dtype:
            row = row.astype(seg.dtype)
        term = row * seg
        acc = term if acc is None else acc + term
    y_ref[:] = jnp.where(is_margin, 0.0, acc)


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
               self.E, self.offsets, self.dtype, self.resident)
        return (self.data_p,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n, obj.C, obj.n_pad, obj.Wl, obj.H, obj.W, obj.E,
         obj.offsets, obj.dtype, obj.resident) = aux
        obj.data_p = children[0]
        return obj

    def __init__(self, A: DIA, chunk: int | None = None,
                 resident: bool | None = None):
        n, m = A.shape
        assert n == m
        offsets = A.offsets
        w = max(max(abs(o) for o in offsets), 1)
        ndiag = len(offsets)
        if resident is None:
            # estimate E at the resident chunk size for the decision
            C_r = min(_round_up(n, 1024), _RESIDENT_CHUNK)
            E_est = (2 * _round_up(w, C_r) + _round_up(n, C_r))
            resident = (_RESIDENT_ENABLED and chunk is None
                        and E_est <= _RESIDENT_E_CAP
                        and _resident_ok("f32"))
        self.resident = bool(resident)
        if chunk is not None:
            C = chunk
        elif self.resident:
            C = min(_round_up(n, 1024), _RESIDENT_CHUNK)
            if n % 1024 == 0:
                while C > 1024 and n % C != 0:
                    C -= 1024
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
        if self.resident and (self.E > _RESIDENT_E_CAP
                              or self.E < self.W):
            # recompute with the DMA-windowed layout
            self.__init__(A, chunk=chunk, resident=False)
            return
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
        dtype = jnp.result_type(self.data_p, x_ext)
        if self.resident:
            kernel = functools.partial(
                _dia_ext_kernel_res, offsets=self.offsets, H=H, C=C,
                lo_chunks=lo_chunks, hi_chunk=hi_chunk)

            def data_map_r(j):
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
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
                    pl.BlockSpec((ndiag, C), data_map_r,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C,), lambda j: (j,),
                                       memory_space=pltpu.VMEM),
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
        kernel = functools.partial(
            _dia_ext_kernel, offsets=self.offsets, H=H, C=C, W=W,
            grid=grid, lo_chunks=lo_chunks, hi_chunk=hi_chunk)

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


# ---------------------------------------------------------------------------
# Double-f32 (compensated) extended operator: fast f64 stencil SpMV
# ---------------------------------------------------------------------------
#
# The reference defaults to fp64 (torch_sparse_linalg.py:57-58); TPU has no
# f64 ALUs, and the XLA-emulated f64 DIA SpMV measures ~23 Gnnz/s. This
# kernel represents every f64 operand as an unevaluated hi+lo f32 pair and
# computes y = Σ d_o · x(+o) with error-free transforms — Dekker twoProd
# (Veltkamp split, no FMA assumed) and Knuth twoSum compensation — entirely
# in native-f32 VPU ops. Measured on the 27-pt n=64³ system: 86 Gnnz/s at
# 4e-14 max relative error vs the f64 oracle (plain f32 would be 2.7e-7) —
# 3.8× the XLA f64 path, with HBM traffic identical to true f64 (8 B per
# matrix value, hi+lo streams).

_SPLIT = 4097.0  # 2^12 + 1: Veltkamp split constant for f32


def _two_prod(a, b):
    """Dekker: a*b = p + e exactly in f32 (no FMA assumed).

    NOTE: the compiled Mosaic kernel preserves the error-free transforms
    exactly (measured 4.6e-15 rel on chip, including mixed-magnitude
    values). The Pallas INTERPRETER forks the sum's rounding by one ulp
    on some rows (same compensation, different stored sum — neither
    barriers nor bitcast pins survive its pipeline), so interpret-mode
    accuracy bottoms out near f32 eps for ill-conditioned values; the
    on-chip case lives in test_tpu_validation.py."""
    import numpy as np

    s = np.float32(_SPLIT)
    p = a * b
    ta = s * a
    a1 = ta - (ta - a)
    a2 = a - a1
    tb = s * b
    b1 = tb - (tb - b)
    b2 = b - b1
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def _two_sum(a, b):
    """Knuth: a+b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _dia_ext_kernel_df(x_hbm, data_ref, y_ref, xa, xb, sems, *, offsets,
                       H, C, W, grid, lo_chunks, hi_chunk):
    """Pairs layout: x_hbm (2, E) f32 [hi; lo]; data block (2·ndiag, C)
    [hi rows | lo rows]; y (2, C) [sum; compensation]; xa/xb (2, W)
    double-buffered windows (same manual-DMA scheme as _dia_ext_kernel)."""
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
    ndiag = len(offsets)

    def x_dma(step, buf, slot):
        start = lax_.sub(lax_.mul(step, i32(C)), i32(H))
        start = lax_.clamp(i32(0), start, i32(E - W))
        start = pl.multiple_of(start, 1024)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(start, W)], buf, sems.at[i32(slot)])

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
        s = jnp.zeros((C,), jnp.float32)
        c = jnp.zeros((C,), jnp.float32)
        for d, o in enumerate(offsets):
            xh = buf[0, H + o: H + o + C]
            xl = buf[1, H + o: H + o + C]
            dh = data_ref[d, :]
            dl = data_ref[ndiag + d, :]
            p, e = _two_prod(dh, xh)
            e = e + dh * xl + dl * xh
            s, es = _two_sum(s, p)
            c = c + es + e
        y_ref[0, :] = jnp.where(is_margin, 0.0, s)
        y_ref[1, :] = jnp.where(is_margin, 0.0, c)

    @pl.when(lax_.eq(parity, i32(0)))
    def _():
        x_dma(j, xa, 0).wait()
        compute(xa)

    @pl.when(lax_.eq(parity, i32(1)))
    def _():
        x_dma(j, xb, 1).wait()
        compute(xb)


def _dia_ext_kernel_df_res(x_ref, data_ref, y_ref, *, offsets, H, C,
                           lo_chunks, hi_chunk):
    """x-resident DF variant: x_ref (2, E) f32 [hi; lo] fully in VMEM,
    data_ref (2·ndiag, C) streamed, y_ref (2, C) [sum; compensation]."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    j = pl.program_id(0)
    is_margin = lax_.bitwise_or(lax_.lt(j, i32(lo_chunks)),
                                lax_.ge(j, i32(hi_chunk)))
    ndiag = len(offsets)
    start = lax_.sub(lax_.mul(j, i32(C)), i32(H))
    start = lax_.clamp(i32(0), start,
                       i32(x_ref.shape[1] - (C + 2 * H)))
    start = pl.multiple_of(start, 1024)
    winh = x_ref[0, pl.ds(start, C + 2 * H)]
    winl = x_ref[1, pl.ds(start, C + 2 * H)]
    s = jnp.zeros((C,), jnp.float32)
    c = jnp.zeros((C,), jnp.float32)
    for d, o in enumerate(offsets):
        xh = winh[H + o: H + o + C]
        xl = winl[H + o: H + o + C]
        dh = data_ref[d, :]
        dl = data_ref[ndiag + d, :]
        p, e = _two_prod(dh, xh)
        e = e + dh * xl + dl * xh
        s, es = _two_sum(s, p)
        c = c + es + e
    y_ref[0, :] = jnp.where(is_margin, 0.0, s)
    y_ref[1, :] = jnp.where(is_margin, 0.0, c)


@jax.tree_util.register_pytree_node_class
class ExtendedStencilOperatorDF:
    """Double-f32 pad-free DIA SpMV on halo-extended hi/lo pair vectors.

    Extended vectors are (2, E) f32 [hi; lo]; `extend` splits an f64
    vector, `extract` recombines to f64. `matvec64` is the f64 → f64
    convenience wrapper (split + kernel + recombine) used for outer
    residuals in mixed-precision refinement and for eager f64 spmv().

    NOTE: unlike ExtendedStencilOperator, the extended space is NOT a
    linear space under naive f32 axpy (hi/lo pairs lose compensation), so
    Krylov iterations must stay in f64 and call `matvec64` — do not run
    solvers directly on extended pair vectors.
    """

    def tree_flatten(self):
        aux = (self.n, self.C, self.n_pad, self.Wl, self.H, self.W,
               self.E, self.offsets, self.resident)
        return (self.data_p,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.n, obj.C, obj.n_pad, obj.Wl, obj.H, obj.W, obj.E,
         obj.offsets, obj.resident) = aux
        obj.data_p = children[0]
        return obj

    def __init__(self, A: DIA, chunk: int | None = None,
                 resident: bool | None = None):
        n, m = A.shape
        assert n == m
        offsets = A.offsets
        w = max(max(abs(o) for o in offsets), 1)
        ndiag = len(offsets)
        if resident is None:
            # hi+lo pairs double the resident x and y: halve the cap
            C_r = min(_round_up(n, 1024), _RESIDENT_CHUNK)
            E_est = (2 * _round_up(w, C_r) + _round_up(n, C_r))
            resident = (_RESIDENT_ENABLED and chunk is None
                        and E_est <= _RESIDENT_E_CAP // 2
                        and _resident_ok("df"))
        self.resident = bool(resident)
        if chunk is not None:
            C = chunk
        elif self.resident:
            C = min(_round_up(n, 1024), _RESIDENT_CHUNK)
            if n % 1024 == 0:
                while C > 1024 and n % C != 0:
                    C -= 1024
        else:
            # hi+lo data doubles the per-chunk block: halve the cap
            max_c = max(1024, (_PIPELINE_VMEM_BUDGET)
                        // (4 * 4 * max(ndiag, 1)) // 1024 * 1024)
            C = min(_round_up(n, 1024), max_c, _CHUNK_CAP // 2)
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
        if self.resident and (self.E > _RESIDENT_E_CAP // 2
                              or self.E < self.W):
            self.__init__(A, chunk=chunk, resident=False)
            return
        self.offsets = offsets
        dh = A.data.astype(jnp.float32)
        dl = (A.data - dh.astype(jnp.float64)).astype(jnp.float32)
        pad = self.n_pad - n
        if pad:
            dh = jnp.pad(dh, ((0, 0), (0, pad)))
            dl = jnp.pad(dl, ((0, 0), (0, pad)))
        self.data_p = jnp.concatenate([dh, dl], axis=0)  # (2·ndiag, n_pad)

    def extend(self, v: jax.Array) -> jax.Array:
        vh = v.astype(jnp.float32)
        vl = (v - vh.astype(jnp.float64)).astype(jnp.float32)
        p = (self.Wl, self.E - self.Wl - self.n)
        return jnp.stack([jnp.pad(vh, p), jnp.pad(vl, p)])

    def extract(self, y_ext: jax.Array) -> jax.Array:
        s = jax.lax.slice(y_ext, (0, self.Wl), (2, self.Wl + self.n))
        return s[0].astype(jnp.float64) + s[1].astype(jnp.float64)

    def matvec64(self, x: jax.Array) -> jax.Array:
        return self.extract(self(self.extend(x)))

    def __call__(self, x_ext: jax.Array) -> jax.Array:
        with jax.enable_x64(False):
            return self._apply(x_ext)

    def _apply(self, x_ext):
        C, H, W = self.C, self.H, self.W
        ndiag = len(self.offsets)
        lo_chunks = self.Wl // C
        grid = self.E // C
        hi_chunk = lo_chunks + self.n_pad // C

        def data_map(j):
            idx = jax.lax.max(
                jax.lax.sub(j, jnp.array(lo_chunks, jnp.int32)),
                jnp.array(0, jnp.int32))
            idx = jax.lax.min(
                idx, jnp.array(self.n_pad // C - 1, jnp.int32))
            return (0, idx)

        if self.resident:
            kernel = functools.partial(
                _dia_ext_kernel_df_res, offsets=self.offsets, H=H, C=C,
                lo_chunks=lo_chunks, hi_chunk=hi_chunk)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((2, self.E), jnp.float32),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
                    pl.BlockSpec((2 * ndiag, C), data_map,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((2, C), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                cost_estimate=pl.CostEstimate(
                    flops=2 * 20 * ndiag * self.n,
                    bytes_accessed=(2 * ndiag + 4) * self.n_pad * 4,
                    transcendentals=0,
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
                interpret=_INTERPRET,
            )(x_ext, self.data_p)

        kernel = functools.partial(
            _dia_ext_kernel_df, offsets=self.offsets, H=H, C=C, W=W,
            grid=grid, lo_chunks=lo_chunks, hi_chunk=hi_chunk)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, self.E), jnp.float32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((2 * ndiag, C), data_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, C), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, W), jnp.float32),
                pltpu.VMEM((2, W), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * 20 * ndiag * self.n,
                bytes_accessed=(2 * ndiag + 4) * self.n_pad * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=_INTERPRET,
        )(x_ext, self.data_p)


_df_op_cache = OperandCache(max_entries=16)


def _cached_df_operator(A: DIA):
    """DF operator for an eagerly-held f64 DIA matrix, cached per matrix
    content (same scheme as _cached_cwell_of_block)."""
    return _df_op_cache.get_or_build(
        A, lambda: make_extended_operator_f64(A))


def make_extended_operator_f64(A: DIA):
    """DF (double-f32) extended operator for f64 DIA matrices; None when
    unsupported. Accuracy ~2^-45 relative (measured 4e-14 on the 27-pt
    system) — suitable for f64-tolerance solves via outer residuals and
    refinement, documented as compensated-f32 rather than true f64."""
    if not _HAS_PALLAS:
        return None
    n, m = A.shape
    if n != m or not A.offsets:
        return None
    if A.data.dtype != jnp.float64:
        return None
    w = max(abs(o) for o in A.offsets)
    if w >= n:
        return None
    return ExtendedStencilOperatorDF(A)
