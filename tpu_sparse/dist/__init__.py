from tpu_sparse.dist.mesh import (initialize_multihost, make_row_mesh,
                                  replicated, row_sharding)
from tpu_sparse.dist.partition import shard_dia, shard_vector, local_rows
from tpu_sparse.dist.spmv import halo_dia_spmv, make_halo_spmv
from tpu_sparse.dist.solvers import (distributed_block_cg, distributed_cg,
                                     distributed_matvec_op,
                                     distributed_minres)

__all__ = [
    "initialize_multihost", "make_row_mesh", "row_sharding", "replicated",
    "shard_dia", "shard_vector", "local_rows",
    "halo_dia_spmv", "make_halo_spmv",
    "distributed_cg", "distributed_block_cg", "distributed_minres",
    "distributed_matvec_op",
]
