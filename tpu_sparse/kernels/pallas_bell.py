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


def _bell_spmm_kernel(idx_ref, blocks_ref, B_ref, y_ref, *, L, bs):
    lax_ = jax.lax
    i32 = lambda v: jnp.array(v, jnp.int32)  # noqa: E731
    r = pl.program_id(0)
    acc = jnp.zeros(y_ref.shape, jnp.float32)
    base = lax_.mul(r, i32(L))
    for l in range(L):
        j = idx_ref[lax_.add(base, i32(l))]
        xb = B_ref[pl.ds(lax_.mul(j, i32(bs)), bs), :]
        acc = acc + jnp.dot(blocks_ref[0, l], xb,
                            preferred_element_type=jnp.float32)
    y_ref[:] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("shape",))
def _bell_spmm_impl(blocks, indices, B, *, shape):
    with jax.enable_x64(False):  # 32-bit trace mode for Mosaic
        nbr, L, bs, _ = blocks.shape
        k = B.shape[1]
        kernel = functools.partial(_bell_spmm_kernel, L=L, bs=bs)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbr,),
            in_specs=[
                pl.BlockSpec((1, L, bs, bs), lambda r: (r, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # B fully resident
            ],
            out_specs=pl.BlockSpec((bs, k), lambda r: (r, 0),
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
        )(indices.reshape(-1), blocks, B)
        return y


def bell_spmm_pallas(A: BELL, B: jax.Array):
    """Pallas BELL SpMM; None signals fallback."""
    if not _HAS_PALLAS:
        return None
    if A.dtype not in (jnp.float32, jnp.bfloat16) or \
            B.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    bs = A.blocksize
    if bs % 8 != 0 or B.shape[1] % 128 != 0:
        return None  # keep MXU-aligned shapes on the fast path
    if B.size > _VMEM_OPERAND_LIMIT:
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
