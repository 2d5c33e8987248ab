"""Distributed preconditioning: block-Jacobi (additive Schwarz, overlap 0)
with per-shard incomplete factorizations.

The classic distributed preconditioner: each shard factors its local
diagonal block A_ii = L_i U_i at setup (host, native ILUT) and applies
M⁻¹ r = diag(M_1⁻¹ … M_d⁻¹) r locally — zero communication per
application.  Application runs as Jacobi sweeps on the factors (nilpotent
iteration, ops/trisolve.py rationale) so every shard executes the same
static program; per-shard factor shapes are padded to a common envelope.

Composes with the distributed SpMV/solvers in parallel/spmv.py: the whole
preconditioned solve stays inside one jit over the mesh.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..linear.ilu import ilut_factor
from ..linear.preconditioner import PreconditionerType
from ..sparse.host import HostCSR
from .mesh import ROW_AXIS


def _ceil_to(x, m):
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockJacobiILU:
    """Stacked per-shard factor applications (row-sharded on axis 0).

    l_data/l_cols: (d, n_loc, kl)  strict-lower factor rows (local ids)
    u_data/u_cols: (d, n_loc, ku)  strict-upper factor rows
    u_dinv:        (d, n_loc)      1/diag(U)
    """

    l_data: jax.Array
    l_cols: jax.Array
    u_data: jax.Array
    u_cols: jax.Array
    u_dinv: jax.Array
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    sweeps: int = dataclasses.field(default=8, metadata=dict(static=True))

    @property
    def n_loc(self):
        return self.l_data.shape[1]


def build_block_jacobi_ilu(A_host: HostCSR, mesh: Mesh, n_pad: int,
                           drop_tol: float = 1e-4, fill_factor: float = 15.0,
                           sweeps: int = 8, dtype=None) -> BlockJacobiILU:
    """Factor each shard's diagonal block; pack factors into uniform-shape
    stacked ELL buffers.  ``n_pad`` is the padded global length the
    distributed vectors use (must be divisible by the mesh size)."""
    d = mesh.devices.size
    assert n_pad % d == 0
    n_loc = n_pad // d
    n = A_host.shape[0]
    dtype = dtype or A_host.data.dtype

    rows, cols, vals = A_host.to_coo()
    blocks = []
    for i in range(d):
        lo, hi = i * n_loc, min((i + 1) * n_loc, n)
        size = n_loc
        keep = (rows >= lo) & (rows < hi) & (cols >= lo) & (cols < hi)
        Ab = HostCSR.from_coo(rows[keep] - lo, cols[keep] - lo, vals[keep],
                              (size, size), sum_duplicates=False)
        # padded rows get unit diagonal so the block factors cleanly
        present = np.zeros(size, dtype=bool)
        br, bc, _ = Ab.to_coo()
        present[br[br == bc]] = True
        missing = np.flatnonzero(~present)
        if len(missing):
            Ab = Ab.add(HostCSR.from_coo(missing, missing,
                                         np.ones(len(missing), vals.dtype),
                                         (size, size)))
        blocks.append(ilut_factor(Ab, drop_tol, fill_factor))

    def pack(parts):
        # strictly-off-diagonal entries only (the sweeps split T = D + N)
        k = 1
        packed = []
        for T in parts:
            r, c, v = T.to_coo()
            off = r != c
            r, c, v = r[off], c[off], v[off]
            counts = np.bincount(r, minlength=T.shape[0])
            k = max(k, int(counts.max()) if len(counts) else 1)
            packed.append((r, c, v))
        data = np.zeros((d, n_loc, k), dtype=dtype)
        colsb = np.full((d, n_loc, k), n_loc, dtype=np.int32)
        for i, (r, c, v) in enumerate(packed):
            order = np.argsort(r, kind="stable")
            r, c, v = r[order], c[order], v[order]
            starts = np.searchsorted(r, np.arange(n_loc))
            slot = np.arange(len(r)) - starts[r]
            data[i, r, slot] = v
            colsb[i, r, slot] = c
        return data, colsb

    l_data, l_cols = pack([L for L, _ in blocks])
    u_data, u_cols = pack([U for _, U in blocks])
    u_dinv = np.ones((d, n_loc), dtype=dtype)
    for i, (_, U) in enumerate(blocks):
        du = U.diagonal()
        u_dinv[i] = 1.0 / np.where(du == 0, 1.0, du)

    sh3 = NamedSharding(mesh, P(ROW_AXIS, None, None))
    sh2 = NamedSharding(mesh, P(ROW_AXIS, None))
    return BlockJacobiILU(
        jax.device_put(jnp.asarray(l_data), sh3),
        jax.device_put(jnp.asarray(l_cols), sh3),
        jax.device_put(jnp.asarray(u_data), sh3),
        jax.device_put(jnp.asarray(u_cols), sh3),
        jax.device_put(jnp.asarray(u_dinv), sh2),
        mesh, sweeps)


class BlockJacobiILUPreconditionerType(PreconditionerType):
    """Factory-style (PreconditionerType) wrapper so the distributed
    block-Jacobi ILU plugs into the solver factories exactly like the
    single-chip preconditioners (reference PreconditionerType.form(A),
    PreconditionerType.py:4-11).

    ``n_pad`` defaults to the sharded operator's padded length when
    ``form`` receives a ShardedDia/ShardedEll as ``A_dev``; otherwise the
    smallest mesh-divisible 8-aligned padding is used — match this to
    ``pad_vector_dia``/``pad_vector_ell`` of the operator you solve with.

    Note: the truncated-sweep application is not symmetric — pair with
    (F)GMRES; for CG raise ``sweeps`` until the factors are applied
    nearly exactly.
    """

    def __init__(self, mesh: Mesh, drop_tol: float = 1e-4,
                 fill_factor: float = 15.0, sweeps: int = 8,
                 side: str = "right", n_pad: int = None):
        self.mesh = mesh
        self.drop_tol = drop_tol
        self.fill_factor = fill_factor
        self.sweeps = sweeps
        self.side = side
        self.n_pad = n_pad

    def form(self, A_host: HostCSR, A_dev=None):
        from ..linear.preconditioner import Preconditioner
        n_pad = self.n_pad
        if n_pad is None and A_dev is not None and hasattr(A_dev, "n_pad"):
            n_pad = A_dev.n_pad
        if n_pad is None:
            d = self.mesh.devices.size
            n_pad = _ceil_to(A_host.shape[0], 8 * d)
        M = build_block_jacobi_ilu(A_host, self.mesh, n_pad,
                                   drop_tol=self.drop_tol,
                                   fill_factor=self.fill_factor,
                                   sweeps=self.sweeps)
        apply = lambda v: block_jacobi_apply(M, v)
        # _wrap marks side="both" as generic (ONE apply usable either
        # side) — hand-building the pair here left generic=False and the
        # GMRES shell applied the full ILU on BOTH sides
        return self._wrap(apply)


def block_jacobi_apply(M: BlockJacobiILU, r: jax.Array) -> jax.Array:
    """z = M⁻¹ r for a row-sharded vector r (length d · n_loc).  Jittable;
    no communication — fully local per shard."""
    n_loc = M.n_loc
    sweeps = M.sweeps

    def local(ld, lc, ud, uc, udinv, r_s):
        ld, lc = ld[0], lc[0]
        ud, uc = ud[0], uc[0]
        udinv = udinv[0]
        rv = r_s.reshape(n_loc)
        pad = jnp.zeros((1,), rv.dtype)

        def sweep_l(x, _):
            xp = jnp.concatenate([x, pad])
            acc = jnp.sum(ld * xp[lc], axis=1)
            return rv - acc, None

        y, _ = jax.lax.scan(sweep_l, rv, None, length=sweeps)

        def sweep_u(x, _):
            xp = jnp.concatenate([x, pad])
            acc = jnp.sum(ud * xp[uc], axis=1)
            return udinv * (y - acc), None

        z, _ = jax.lax.scan(sweep_u, udinv * y, None, length=sweeps)
        return z

    f = shard_map(local, mesh=M.mesh,
                  in_specs=(P(ROW_AXIS, None, None), P(ROW_AXIS, None, None),
                            P(ROW_AXIS, None, None), P(ROW_AXIS, None, None),
                            P(ROW_AXIS, None), P(ROW_AXIS)),
                  out_specs=P(ROW_AXIS))
    return f(M.l_data, M.l_cols, M.u_data, M.u_cols, M.u_dinv, r)
