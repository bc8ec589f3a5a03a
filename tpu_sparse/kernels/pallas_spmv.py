"""Pallas TPU SpMV kernels (DIA stencil + BSR block kernels).

Placeholder returning None routes callers to the XLA reference kernels; the
real kernels land in the Pallas milestone.
"""

from __future__ import annotations


def dia_spmv_pallas(A, x):
    return None


def bsr_spmv_pallas(A, x):
    return None
