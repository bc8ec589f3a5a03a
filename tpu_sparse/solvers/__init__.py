from tpu_sparse.solvers.krylov import (
    bicgstab,
    bicgstab_full,
    cg,
    cg_full,
    gmres,
    gmres_full,
)

__all__ = ["cg", "bicgstab", "gmres", "cg_full", "bicgstab_full", "gmres_full"]
