"""Host-side format construction and conversion.

Parity target: the reference's converters in utils/matrix_utils.py:12-140
(dense↔COO↔CSR↔CSC). Conversions here run on host (numpy) because they are
setup-time operations with data-dependent shapes; the resulting containers
hold device arrays with static shapes, ready for jit.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpu_sparse.sparse.containers import BSR, COO, CSR, DIA


def _np(a) -> np.ndarray:
    return np.asarray(a)


def dense_to_csr(A, tol: float = 0.0) -> CSR:
    """Build CSR from a dense matrix, dropping |a| <= tol entries."""
    An = _np(A)
    mask = np.abs(An) > tol
    row, col = np.nonzero(mask)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    data = An[row, col]
    indptr = np.zeros(An.shape[0] + 1, dtype=np.int32)
    np.add.at(indptr, row + 1, 1)
    indptr = np.cumsum(indptr, dtype=np.int32)
    return CSR(
        jnp.asarray(data),
        jnp.asarray(col.astype(np.int32)),
        jnp.asarray(indptr),
        An.shape,
    )


def dense_to_coo(A, tol: float = 0.0) -> COO:
    An = _np(A)
    row, col = np.nonzero(np.abs(An) > tol)
    return COO(
        jnp.asarray(An[row, col]),
        jnp.asarray(row.astype(np.int32)),
        jnp.asarray(col.astype(np.int32)),
        An.shape,
    )


def coo_to_csr(A: COO) -> CSR:
    """Host-side COO→CSR through scipy's C converter (duplicates summed).

    The previous numpy lexsort + ufunc.at path took 15 s on a 56M-nnz
    matrix and dominated AMG setup; scipy's coo→csr is ~20× faster."""
    import scipy.sparse as sp

    row, col, data = _np(A.row), _np(A.col), _np(A.data)
    S = sp.csr_matrix((data, (row, col)), shape=A.shape)
    S.sort_indices()
    return CSR(
        jnp.asarray(S.data),
        jnp.asarray(S.indices.astype(np.int32)),
        jnp.asarray(S.indptr.astype(np.int32)),
        A.shape,
    )


def csr_from_arrays(data, indices, indptr, shape) -> CSR:
    return CSR(
        jnp.asarray(data),
        jnp.asarray(_np(indices).astype(np.int32)),
        jnp.asarray(_np(indptr).astype(np.int32)),
        shape,
    )


def csr_to_dia(A: CSR, max_diags: Optional[int] = None) -> Optional[DIA]:
    """Convert CSR to DIA if the number of distinct diagonals is small.

    Returns None when the matrix is not diagonal-structured (more than
    ``max_diags`` distinct offsets), so callers can fall back to CSR.
    """
    n, m = A.shape
    data = _np(A.data)
    indices = _np(A.indices)
    indptr = _np(A.indptr)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    offs = indices.astype(np.int64) - rows
    uniq = np.unique(offs)
    if max_diags is None:
        max_diags = 64
    if uniq.size > max_diags:
        return None
    dia_data = np.zeros((uniq.size, n), dtype=data.dtype)
    pos = np.searchsorted(uniq, offs)
    # add.at, not fancy assignment: duplicate (row, col) entries must sum,
    # matching the containers' materialization contract.
    np.add.at(dia_data, (pos, rows), data)
    return DIA(jnp.asarray(dia_data), tuple(int(o) for o in uniq), (n, m))


def dia_from_offsets(offsets, diag_data, shape) -> DIA:
    """Build DIA directly from offsets + (ndiag, n) data array."""
    return DIA(jnp.asarray(diag_data), tuple(int(o) for o in offsets), shape)


def csr_to_bsr(A: CSR, blocksize: int) -> BSR:
    """Convert CSR to BSR with the given block size (shape must divide)."""
    n, m = A.shape
    bs = blocksize
    if n % bs or m % bs:
        raise ValueError(f"shape {A.shape} not divisible by blocksize {bs}")
    data = _np(A.data)
    indices = _np(A.indices)
    indptr = _np(A.indptr)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    brow = rows // bs
    bcol = indices // bs
    keys = brow.astype(np.int64) * (m // bs) + bcol
    uniq, inv = np.unique(keys, return_inverse=True)
    nblocks = uniq.size
    blocks = np.zeros((nblocks, bs, bs), dtype=data.dtype)
    np.add.at(blocks, (inv, rows % bs, indices % bs), data)  # sum dups
    ubrow = (uniq // (m // bs)).astype(np.int32)
    ubcol = (uniq % (m // bs)).astype(np.int32)
    bindptr = np.zeros(n // bs + 1, dtype=np.int32)
    np.add.at(bindptr, ubrow + 1, 1)
    bindptr = np.cumsum(bindptr, dtype=np.int32)
    return BSR(jnp.asarray(blocks), jnp.asarray(ubcol), jnp.asarray(bindptr), (n, m))


def dia_to_csr_arrays(A: DIA):
    """Vectorized host DIA→CSR (numpy): (data, indices, indptr).

    Keeps explicit in-band zeros (pattern semantics, like DIA.tocoo) and
    emits sorted column indices per row. ~4× faster than scipy's
    ``dia_tocsr`` because it scatters each diagonal directly into its
    final CSR slot: with offsets sorted ascending, the diagonals valid at
    row i are the contiguous sorted-offset range [lo(i), hi(i)) with
    lo(i) = searchsorted(offsets, -i), so the slot of sorted-diagonal
    ``dpos`` in row i is ``indptr[i] + dpos - lo(i)``.
    """
    data = _np(A.data)
    n, m = A.shape
    if data.dtype in (np.float32, np.float64):
        from tpu_sparse import native
        if native.available():
            return native.dia_to_csr(data, A.offsets, A.shape)
    offs = np.asarray(A.offsets, dtype=np.int64)
    order = np.argsort(offs, kind="stable")
    offs_s = offs[order]
    i = np.arange(n, dtype=np.int64)
    lo = np.searchsorted(offs_s, -i)
    hi = np.searchsorted(offs_s, m - i)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(hi - lo, out=indptr[1:])
    # Row-major staging: dataT[i, dpos] = A[i, i + offs_s[dpos]]. The fancy
    # transpose copy streams 27 sequential reads + 1 sequential write
    # (cache-friendly); a per-diagonal scatter into CSR slots would write
    # with a ~ndiag*12-byte stride and miss cache on every store.
    dataT = data.T[:, order] if order.size else data.T
    k = np.arange(offs_s.size)
    mask = (k >= lo[:, None]) & (k < hi[:, None])
    # C-order boolean extraction == row-major CSR order with sorted columns.
    out = dataT[mask]
    cols = np.arange(n, dtype=np.int32)[:, None] + offs_s.astype(np.int32)
    indices = cols[mask]
    if indptr[-1] <= np.iinfo(np.int32).max:
        indptr = indptr.astype(np.int32)
    return out, indices, indptr


def to_scipy_csr(A):
    """Convert any supported operand to a scipy CSR without bouncing the
    result through device arrays (setup-time host path, e.g. AMG)."""
    import scipy.sparse as sp

    if isinstance(A, CSR):
        return sp.csr_matrix(
            (_np(A.data), _np(A.indices), _np(A.indptr)), shape=A.shape)
    if isinstance(A, DIA):
        data, indices, indptr = dia_to_csr_arrays(A)
        S = sp.csr_matrix((data, indices, indptr), shape=A.shape)
        S.has_sorted_indices = True
        return S
    if isinstance(A, BSR):
        A = A.tocoo()
    if isinstance(A, COO):
        S = sp.csr_matrix(
            (_np(A.data), (_np(A.row), _np(A.col))), shape=A.shape)
        S.sort_indices()
        return S
    return sp.csr_matrix(_np(A))


def to_csr(A) -> CSR:
    """Best-effort conversion of any supported operand to CSR."""
    if isinstance(A, CSR):
        return A
    if isinstance(A, COO):
        return coo_to_csr(A)
    if isinstance(A, DIA):
        data, indices, indptr = dia_to_csr_arrays(A)
        return CSR(jnp.asarray(data), jnp.asarray(indices),
                   jnp.asarray(indptr), A.shape)
    if isinstance(A, BSR):
        return coo_to_csr(A.tocoo())
    if hasattr(A, "tocsr"):  # CWELL / CWELLSeg / BELL host-side repacks
        return A.tocsr()
    return dense_to_csr(A)
