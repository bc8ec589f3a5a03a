from tpu_sparse.sparse.containers import BSR, COO, CSR, DIA, is_sparse
from tpu_sparse.sparse.convert import (
    coo_to_csr,
    csr_from_arrays,
    csr_to_bsr,
    csr_to_dia,
    dense_to_coo,
    dense_to_csr,
    dia_from_offsets,
    to_csr,
)
from tpu_sparse.sparse import generators
from tpu_sparse.sparse.bell import BELL, bsr_to_bell
from tpu_sparse.sparse.optimize import to_tpu_operator

__all__ = [
    "BELL", "BSR", "COO", "CSR", "DIA", "is_sparse",
    "bsr_to_bell", "coo_to_csr", "csr_from_arrays", "csr_to_bsr",
    "csr_to_dia", "dense_to_coo", "dense_to_csr", "dia_from_offsets",
    "to_csr", "to_tpu_operator", "generators",
]
