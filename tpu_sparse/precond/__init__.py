from tpu_sparse.precond.jacobi import (
    diagonal,
    jacobi_preconditioner,
    l1_jacobi_diag,
)
from tpu_sparse.precond.amg import (
    AMGHierarchy,
    AMGLevel,
    amg_preconditioner,
    amg_setup,
    amg_solve,
    amg_stationary_solve,
    v_cycle,
)
from tpu_sparse.precond.poly import (
    chebyshev_preconditioner,
    ilu0_factor,
    ilu0_preconditioner,
    neumann_preconditioner,
)
from tpu_sparse.precond.fsai import (
    fsai_preconditioner,
    fsai_setup,
)

__all__ = [
    "diagonal", "jacobi_preconditioner", "l1_jacobi_diag",
    "AMGHierarchy", "AMGLevel", "amg_preconditioner", "amg_setup",
    "amg_solve", "amg_stationary_solve", "v_cycle",
    "chebyshev_preconditioner", "ilu0_factor", "ilu0_preconditioner",
    "neumann_preconditioner",
    "fsai_preconditioner", "fsai_setup",
]
