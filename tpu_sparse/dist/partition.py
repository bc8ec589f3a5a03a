"""Row partitioning of sparse operands onto a device mesh.

DIA (banded/stencil) matrices row-partition perfectly: the (ndiag, n) data
array shards along its row dimension, and SpMV needs only a halo of width
``bandwidth`` from each neighbor — the structural analogue of context
parallelism (SURVEY.md §5 'long-context' note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_sparse.dist.mesh import ROW_AXIS, row_sharding
from tpu_sparse.sparse.containers import DIA


def _pad_rows_to(n: int, n_dev: int) -> int:
    return ((n + n_dev - 1) // n_dev) * n_dev


def pad_dia(A: DIA, n_dev: int) -> DIA:
    """Pad a square DIA matrix with identity rows so n divides the mesh.

    The padding block is the identity, so solving the padded system leaves
    the added coordinates at b's padded value (zero) without affecting the
    original solution."""
    n, m = A.shape
    n_pad = _pad_rows_to(n, n_dev)
    if n_pad == n:
        return A
    offsets = A.offsets if 0 in A.offsets else A.offsets + (0,)
    data = jnp.zeros((len(offsets), n_pad), dtype=A.dtype)
    for d, o in enumerate(offsets):
        if o in A.offsets:
            src = A.data[A.offsets.index(o)]
            data = data.at[d, :n].set(src)
        if o == 0:
            data = data.at[d, n:].set(1.0)
    # zero out entries whose column index falls into [n, n_pad) from
    # original rows (there are none: original offsets never reach past m
    # within rows < n ... only sub/super diagonals of padded rows, zeroed).
    return DIA(data, offsets, (n_pad, n_pad))


def pad_vector(b: jax.Array, n_dev: int) -> jax.Array:
    n = b.shape[0]
    n_pad = _pad_rows_to(n, n_dev)
    if n_pad == n:
        return b
    return jnp.pad(b, (0, n_pad - n))


def shard_dia(A: DIA, mesh: Mesh) -> DIA:
    """Place a DIA matrix row-sharded on the mesh (pads to divisibility).

    No bandwidth constraint: when bandwidth exceeds the shard size the
    halo-exchange SpMV falls back to an all_gather of x
    (dist.spmv.make_allgather_spmv); gspmd mode never needed one."""
    n_dev = mesh.devices.size
    A = pad_dia(A, n_dev)
    data = jax.device_put(A.data, row_sharding(mesh, ndim=2, row_axis_pos=1))
    return DIA(data, A.offsets, A.shape)


def shard_vector(b: jax.Array, mesh: Mesh) -> jax.Array:
    n_dev = mesh.devices.size
    b = pad_vector(b, n_dev)
    return jax.device_put(b, row_sharding(mesh, ndim=1))


def local_rows(n: int, mesh: Mesh) -> int:
    n_dev = mesh.devices.size
    return _pad_rows_to(n, n_dev) // n_dev
