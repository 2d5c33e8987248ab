from .mesh import make_mesh, row_sharding, replicated, ROW_AXIS
from .spmv import (ShardedDia, ShardedEll, shard_dia, shard_ell,
                   dist_dia_spmv, dist_ell_spmv, pad_vector_dia,
                   pad_vector_ell)

__all__ = [
    "make_mesh", "row_sharding", "replicated", "ROW_AXIS",
    "ShardedDia", "ShardedEll", "shard_dia", "shard_ell",
    "dist_dia_spmv", "dist_ell_spmv", "pad_vector_dia", "pad_vector_ell",
]
