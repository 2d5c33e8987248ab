"""2-D block-partitioned SpMV over a (rows, cols) device mesh.

The 1-D layouts in ``parallel/spmv.py`` shard rows only; their halo is
either the band overlap (ppermute) or the whole vector (all-gather).  At
large device counts the all-gather variant moves O(n) per device per
matvec.  The classic fix (SURVEY §2.3's "1D/2D device mesh" plan; see the
2-D SpMV literature, e.g. SUMMA-style decompositions) is a pr x pc
process grid: device (i, j) owns the sparse block A[i, j]; a matvec is

    expand:  all-gather x's pieces along the "rows" axis (pr devices)
             -> each device holds its column block x_j        [n/pc data]
    local:   w = A[i, j] @ x_j                                 [no comm]
    fold:    psum_scatter w along the "cols" axis (pc devices)
             -> y distributed like x                           [n/pc data]

Per-device communication is O(n/pc + n/pr) instead of O(n): growing the
grid in both directions keeps the wire cost per chip flat for banded
matrices and sub-linear in general.

Layout trick that removes the usual vector transpose: vectors are sharded
JOINTLY over both mesh axes, spec ``P(("rows", "cols"))`` — n split into
pr*pc sub-chunks, device (i, j) holding sub-chunk ``i*pc + j``.  The
matrix's COLUMN partition is then defined on the *strided* chunk sets

    column block j  =  { g : (g // sub) % pc == j }

which is exactly what ``all_gather`` along "rows" reconstructs from the
joint layout; and ``psum_scatter`` along "cols" of the row-block result
lands the output back in the SAME joint layout.  Expand + fold round-trip
with no extra permutation, so CG/GMRES iterate on one stable sharding and
GSPMD inserts two-axis psums for the dot products automatically.

The reference has no distribution anywhere (single-process numpy,
SURVEY §2.3); this module is part of the TPU-native scaling layer.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..sparse.host import HostCSR

R_AXIS = "rows"
C_AXIS = "cols"


def make_mesh_2d(pr: int, pc: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A pr x pc mesh with axes ("rows", "cols")."""
    devs = np.array(devices if devices is not None
                    else jax.devices()[: pr * pc]).reshape(pr, pc)
    return Mesh(devs, axis_names=(R_AXIS, C_AXIS))


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedEll2D:
    """ELL blocks on a pr x pc grid, vector layout P(("rows","cols")).

    data/lcols are (n_pad, pc, k): axis 0 sharded by "rows" (contiguous
    row blocks of rslab = n_pad/pr rows), axis 1 by "cols" (one column
    block per device).  lcols index the all-gathered column block
    [0, pr*sub); the value pr*sub is the safe zero slot for ELL padding.
    """

    data: jax.Array
    lcols: jax.Array
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    sub: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_pad(self):
        return self.data.shape[0]

    @property
    def grid(self):
        return (self.mesh.shape[R_AXIS], self.mesh.shape[C_AXIS])


def shard_ell_2d(A_host: HostCSR, mesh: Mesh, dtype=None) -> ShardedEll2D:
    """Partition a host CSR matrix onto the 2-D mesh as ELL blocks."""
    pr, pc = mesh.shape[R_AXIS], mesh.shape[C_AXIS]
    n = A_host.shape[0]
    sub = _ceil_to(max((n + pr * pc - 1) // (pr * pc), 8), 8)
    n_pad = sub * pr * pc
    rslab = sub * pc

    rows, cols, vals = A_host.to_coo()
    dtype = dtype or A_host.data.dtype

    chunk = cols // sub
    jblk = chunk % pc                       # owning column block
    lid = (chunk // pc) * sub + cols % sub  # id within the gathered block

    # rank of each nonzero within its (row, column-block) group -> ELL slot
    order = np.lexsort((lid, jblk, rows))
    r_s, j_s, l_s, v_s = rows[order], jblk[order], lid[order], vals[order]
    group = r_s.astype(np.int64) * pc + j_s
    new_group = np.empty(len(group), dtype=bool)
    if len(group):
        new_group[0] = True
        new_group[1:] = group[1:] != group[:-1]
    starts = np.flatnonzero(new_group)
    rank = np.arange(len(group)) - np.repeat(
        starts, np.diff(np.append(starts, len(group))))
    k = int(rank.max()) + 1 if len(rank) else 1

    data = np.zeros((n_pad, pc, k), dtype=dtype)
    lcols = np.full((n_pad, pc, k), pr * sub, dtype=np.int32)  # zero slot
    data[r_s, j_s, rank] = v_s.astype(dtype)
    lcols[r_s, j_s, rank] = l_s

    sh = NamedSharding(mesh, P(R_AXIS, C_AXIS, None))
    return ShardedEll2D(jax.device_put(jnp.asarray(data), sh),
                        jax.device_put(jnp.asarray(lcols), sh),
                        A_host.shape, mesh, sub)


def dist_ell_2d_spmv(A: ShardedEll2D, x: jax.Array, *,
                     comm: bool = True) -> jax.Array:
    """y = A @ x, x sharded P(("rows","cols")) of length n_pad.  Jittable.

    One all-gather over the pr-device "rows" axis (expand), a local ELL
    multiply, one psum_scatter over the pc-device "cols" axis (fold).

    ``comm=False`` is the DIAGNOSTIC mode (same contract as
    dist_dia_spmv(halo=False)): the all-gather is replaced by a local
    tile of the device's own sub-chunk and the psum_scatter by a local
    slice — numerically WRONG, identical local compute/memory shape;
    isolates the collectives' share of distributed overhead
    (benchmarks/weak_scaling.py)."""
    mesh = A.mesh
    pr, pc = A.grid
    sub = A.sub

    def local(data_s, lcols_s, x_s):
        # data_s/lcols_s: (rslab, 1, k); x_s: (sub,) this device's sub-chunk
        if comm:
            xg = jax.lax.all_gather(x_s.reshape(-1), R_AXIS, tiled=True)
        else:
            xg = jnp.tile(x_s.reshape(-1), pr)      # same bytes, no wire
        xg = jnp.concatenate([xg, jnp.zeros((1,), xg.dtype)])  # pad slot
        g = jnp.take(xg, lcols_s[:, 0, :], axis=0)
        w = jnp.sum(data_s[:, 0, :] * g, axis=1)               # (rslab,)
        if pc > 1:
            if comm:
                return jax.lax.psum_scatter(w, C_AXIS,
                                            scatter_dimension=0,
                                            tiled=True)
            j = jax.lax.axis_index(C_AXIS)
            return jax.lax.dynamic_slice(w, (j * sub,), (sub,))
        return w

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(R_AXIS, C_AXIS, None),
                            P(R_AXIS, C_AXIS, None),
                            P((R_AXIS, C_AXIS))),
                  out_specs=P((R_AXIS, C_AXIS)))
    return f(A.data, A.lcols, x)


def pad_vector_2d(A: ShardedEll2D, v: np.ndarray) -> jax.Array:
    """Pad a length-n host vector to n_pad and place it in the joint
    P(("rows","cols")) layout."""
    vp = np.zeros(A.n_pad, dtype=v.dtype)
    vp[: len(v)] = v
    return jax.device_put(jnp.asarray(vp),
                          NamedSharding(A.mesh, P((R_AXIS, C_AXIS))))


def unpad_vector_2d(A: ShardedEll2D, x: jax.Array) -> np.ndarray:
    return np.asarray(x)[: A.shape[0]]
