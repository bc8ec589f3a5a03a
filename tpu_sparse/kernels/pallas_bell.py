"""Pallas BELL (block-ELL) SpMV/SpMM kernels — dense blocks on the MXU.

Grid: one block row per step. The block stripe (L, bs, bs) streams through
VMEM via the auto-pipelined BlockSpec; the dense operand stays fully in
VMEM (capped); block-column ids arrive via scalar prefetch (SMEM) so each
step's operand slices are dynamic *slices*, not gathers.

XLA fallbacks (`bell_spmv`/`bell_spmm`) live in kernels/reference.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_sparse.sparse.bell import BELL

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# dense operand must fit comfortably in VMEM alongside a block stripe
_VMEM_OPERAND_LIMIT = 2 * 1024 * 1024  # elements

_INTERPRET = False  # flip in tests to run the kernels on CPU


def _bell_spmm_kernel(idx_ref, blocks_ref, B_ref, y_ref, *, L, bs):
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    r = pl.program_id(0)
    acc = jnp.zeros(y_ref.shape, jnp.float32)
    base = lax_.mul(r, i32(L))
    for l in range(L):
        j = idx_ref[lax_.add(base, i32(l))]
        xb = B_ref[pl.ds(lax_.mul(j, i32(bs)), bs), :]
        # precision=HIGHEST: the MXU truncates f32 inputs to bf16 by
        # default (measured 3.7e-3 rel error on chip); 3-pass f32 keeps
        # the SpMM bit-comparable with the XLA einsum fallback.
        acc = acc + jnp.dot(blocks_ref[0, l], xb,
                            preferred_element_type=jnp.float32,
                            precision=lax_.Precision.HIGHEST)
    y_ref[:] = acc.astype(y_ref.dtype)


def _bell_spmm_kernel_tiled(idx_ref, blocks_ref, B_ref, y_ref, *, L, bs):
    """Column-tiled variant: grid=(block rows, k tiles); B arrives as a
    (all rows, TK) column stripe per step, so wide dense operands no longer
    need to fit VMEM whole."""
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    r = pl.program_id(0)
    acc = jnp.zeros(y_ref.shape, jnp.float32)
    base = lax_.mul(r, i32(L))
    for l in range(L):
        j = idx_ref[lax_.add(base, i32(l))]
        xb = B_ref[pl.ds(lax_.mul(j, i32(bs)), bs), :]
        acc = acc + jnp.dot(blocks_ref[0, l], xb,
                            preferred_element_type=jnp.float32,
                            precision=lax_.Precision.HIGHEST)
    y_ref[:] = acc.astype(y_ref.dtype)


_K_TILE = 512


@functools.partial(jax.jit, static_argnames=("shape",))
def _bell_spmm_impl(blocks, indices, B, *, shape):
    with jax.enable_x64(False):  # 32-bit trace mode for Mosaic
        nbr, L, bs, _ = blocks.shape
        k_orig = B.shape[1]
        k = (k_orig + 127) // 128 * 128
        if k != k_orig:
            B = jnp.pad(B, ((0, 0), (0, k - k_orig)))
        if k <= _K_TILE:
            kernel = functools.partial(_bell_spmm_kernel, L=L, bs=bs)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nbr,),
                in_specs=[
                    # index maps receive (grid..., scalar_prefetch_ref)
                    pl.BlockSpec((1, L, bs, bs),
                                 lambda r, idx: (r, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # B resident
                ],
                out_specs=pl.BlockSpec((bs, k), lambda r, idx: (r, 0),
                                       memory_space=pltpu.VMEM),
            )
        else:
            kt = (k + _K_TILE - 1) // _K_TILE
            if k != kt * _K_TILE:
                B = jnp.pad(B, ((0, 0), (0, kt * _K_TILE - k)))
                k = kt * _K_TILE
            kernel = functools.partial(_bell_spmm_kernel_tiled, L=L, bs=bs)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nbr, kt),
                in_specs=[
                    pl.BlockSpec((1, L, bs, bs),
                                 lambda r, c, idx: (r, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((B.shape[0], _K_TILE),
                                 lambda r, c, idx: (0, c),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bs, _K_TILE),
                                       lambda r, c, idx: (r, c),
                                       memory_space=pltpu.VMEM),
            )
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((shape[0], k), B.dtype),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * nbr * L * bs * bs * k,
                bytes_accessed=blocks.size * 4 + B.size * 4
                + shape[0] * k * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=_INTERPRET,
        )(indices.reshape(-1), blocks, B)
        return y[:, :k_orig] if k != k_orig else y


def bell_spmm_pallas(A: BELL, B: jax.Array):
    """Pallas BELL SpMM; None signals fallback."""
    if not _HAS_PALLAS:
        return None
    if A.dtype not in (jnp.float32, jnp.bfloat16) or \
            B.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    bs = A.blocksize
    if bs % 8 != 0:
        return None  # sublane-aligned blocks only (MXU tiling)
    # k is padded to 128 inside the impl; wide operands run the
    # column-tiled kernel, so only the per-tile B stripe must fit VMEM.
    if B.shape[0] * min((B.shape[1] + 127) // 128 * 128, _K_TILE) \
            > _VMEM_OPERAND_LIMIT:
        return None
    return _bell_spmm_impl(A.blocks, A.indices, B, shape=A.shape)


def bell_spmv_pallas(A: BELL, x: jax.Array):
    """BELL SpMV through the CWELL Pallas kernel: dense blocks repack into
    column-window ELL at ~100% fill (cached per matrix object, host-side),
    so the general windowed-gather kernel is the block SpMV kernel too.
    Returns None under tracing — promote with
    ``sparse.optimize.to_tpu_operator`` before jit for compiled solvers."""
    if not _HAS_PALLAS:
        return None
    if isinstance(A.blocks, jax.core.Tracer) or \
            isinstance(x, jax.core.Tracer):
        return None
    from tpu_sparse.kernels.pallas_spmv import _cached_cwell_of_block

    W = _cached_cwell_of_block(A)
    if W is None:
        return None
    from tpu_sparse.kernels.pallas_cwell import cwell_spmv_pallas

    return cwell_spmv_pallas(W, x)
