from tpu_sparse.autodiff.implicit import (
    bicgstab_diff,
    cg_diff,
    cg_sr_diff,
    fcg_diff,
    fgmres_diff,
    gmres_diff,
    minres_diff,
)

__all__ = ["cg_diff", "cg_sr_diff", "fcg_diff", "bicgstab_diff",
           "gmres_diff", "fgmres_diff", "minres_diff"]
