from tpu_sparse.api.solver import SolverResult, SparseSolver, solve

__all__ = ["SolverResult", "SparseSolver", "solve"]
