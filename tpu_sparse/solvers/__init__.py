from tpu_sparse.solvers.krylov import (
    bicgstab,
    bicgstab_full,
    cg,
    cg_full,
    gmres,
    gmres_full,
)
from tpu_sparse.solvers.mixed import (
    bicgstab_refined,
    cg_refined,
    gmres_refined,
    refined_solve,
)

__all__ = [
    "cg", "bicgstab", "gmres", "cg_full", "bicgstab_full", "gmres_full",
    "cg_refined", "bicgstab_refined", "gmres_refined", "refined_solve",
]
