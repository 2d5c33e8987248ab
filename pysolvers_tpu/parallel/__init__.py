from .mesh import make_mesh, row_sharding, replicated, ROW_AXIS
from .spmv import (ShardedDia, ShardedEll, shard_dia, shard_ell,
                   dist_dia_spmv, dist_ell_spmv, pad_vector_dia,
                   pad_vector_ell)
from .precond import (BlockJacobiILU, build_block_jacobi_ilu,
                      block_jacobi_apply,
                      BlockJacobiILUPreconditionerType)

__all__ = [
    "make_mesh", "row_sharding", "replicated", "ROW_AXIS",
    "ShardedDia", "ShardedEll", "shard_dia", "shard_ell",
    "dist_dia_spmv", "dist_ell_spmv", "pad_vector_dia", "pad_vector_ell",
    "BlockJacobiILU", "build_block_jacobi_ilu", "block_jacobi_apply",
    "BlockJacobiILUPreconditionerType",
]
