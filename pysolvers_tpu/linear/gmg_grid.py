"""Structured-grid geometric multigrid: gather-free V-cycles on TPU.

The sparse GMG executor (gmg.py) stores the interpolation operators as
sparse matrices, whose SpMV on TPU needs gathers (the rectangular
transfers don't band-pack).  On a uniform 1-D/2-D Dirichlet grid the
transfers are *structured*: prolongation is interleave + neighbor
averaging, restriction is full weighting — pure strided slicing and
adds on the VPU, no gathers at all.  Level operators are stencils, so
they ride the gather-free DIA kernel.  The entire V-cycle is therefore
gather-free: the TPU-native way to run multigrid on structured problems
(reference analog: the stashed mesh-refinement GMG,
`stash/GMGVCycleSolver.py:16-28`, built on scipy SpMV).

Exactness contract: `grid_prolong` / `grid_restrict` compute exactly the
same linear maps as `gmg.interp_1d/interp_2d` and the row-normalized
transpose (`amg.make_restriction`), so the Galerkin hierarchy from
`gmg.build_gmg_hierarchy` applies unchanged (tests pin this equality).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import matvec
from ..sparse.device import DiaMatrix
from ..sparse.host import HostCSR
from .amg import MLHierarchy, _smooth
from .gmg import build_gmg_hierarchy


# ---------------------------------------------------------------------------
# Grid transfer kernels (strided slicing — no gathers, no scatters)
# ---------------------------------------------------------------------------

def _prolong_last(X: jax.Array, m_f: int) -> jax.Array:
    """Linear interpolation along the last axis: (..., m_c) → (..., m_f)
    with m_f = 2·m_c + 1 (gmg.interp_1d's map).

    fine[2c+1] = coarse[c]; fine[2k] = (coarse[k−1] + coarse[k])/2 with
    Dirichlet zeros outside.  Built by interleaving the midpoint and
    coincident streams (stack + reshape — XLA lowers this to cheap
    layout ops, not scatter).
    """
    m_c = X.shape[-1]
    pad = [(0, 0)] * (X.ndim - 1)
    xp = jnp.pad(X, pad + [(1, 1)])                      # (..., m_c+2)
    even = 0.5 * (xp[..., :-1] + xp[..., 1:])            # (..., m_c+1)
    odd = jnp.pad(X, pad + [(0, 1)])                     # (..., m_c+1)
    out = jnp.stack([even, odd], axis=-1)                # (..., m_c+1, 2)
    return out.reshape(X.shape[:-1] + (2 * m_c + 2,))[..., :m_f]


def _restrict_last(X: jax.Array) -> jax.Array:
    """Full weighting along the last axis: (..., m_f) → (..., m_c).

    coarse[c] = fine[2c]/4 + fine[2c+1]/2 + fine[2c+2]/4 — exactly the
    row-normalized transpose of `_prolong_last` (make_restriction)."""
    e = X[..., 0::2]                                     # (..., m_c+1)
    o = X[..., 1::2]                                     # (..., m_c)
    return 0.5 * o + 0.25 * (e[..., :-1] + e[..., 1:])


def grid_prolong(x: jax.Array, ndim: int, m_c: int, m_f: int) -> jax.Array:
    """Interpolate a flat interior-grid vector coarse → fine."""
    if ndim == 1:
        return _prolong_last(x, m_f)
    X = x.reshape(m_c, m_c)
    X = _prolong_last(X, m_f)                            # along axis 1
    X = _prolong_last(X.T, m_f).T                        # along axis 0
    return X.reshape(m_f * m_f)


def grid_restrict(x: jax.Array, ndim: int, m_f: int, m_c: int) -> jax.Array:
    """Full-weighting restriction of a flat interior-grid vector."""
    if ndim == 1:
        return _restrict_last(x)
    X = x.reshape(m_f, m_f)
    X = _restrict_last(X)
    X = _restrict_last(X.T).T
    return X.reshape(m_c * m_c)


# ---------------------------------------------------------------------------
# Device hierarchy
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridLevel:
    A_dev: object                    # DIA stencil operator
    dinv: jax.Array                  # 1/diag for Jacobi/Chebyshev
    gs_plan: object                  # unused (grid executor: jacobi/cheb)
    cheb: Optional[tuple]            # (theta, delta) for Chebyshev


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridHierarchy:
    """Registered pytree (rides as a traced jit argument, like
    amg.DeviceHierarchy — re-built same-shape hierarchies reuse one
    compiled graph)."""

    levels: List[GridLevel]          # coarsest-first; levels[0] unused
    A0_inv: jax.Array                # coarsest dense inverse
    ms: tuple = dataclasses.field(metadata=dict(static=True))
    ndim: int = dataclasses.field(metadata=dict(static=True))
    smoother: str = dataclasses.field(metadata=dict(static=True))
    nu_pre: int = dataclasses.field(metadata=dict(static=True))
    nu_post: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_levels(self):
        return len(self.levels)


def build_grid_hierarchy(A: Optional[HostCSR], num_levels: int,
                         dims: Tuple[int, ...], smoother: str = "jacobi",
                         nu_pre: int = 2, nu_post: int = 2,
                         dtype=np.float32,
                         mlh: Optional[MLHierarchy] = None) -> GridHierarchy:
    """Galerkin hierarchy (gmg.build_gmg_hierarchy) lowered as DIA
    stencils; the coarsest dense inverse and every upload ride ONE fused
    dispatch (ops/fuse.py).  Smoothers: "jacobi" (ω=2/3) or "chebyshev"
    (GS needs triangular solves — use the sparse executor for that).

    Pass ``mlh`` to lower an already-built Galerkin sequence (the OO
    shell's hierarchy hook); otherwise it is built from ``A``."""
    if smoother == "auto":
        smoother = "jacobi"      # the gather-free executor's native choice
    if smoother not in ("jacobi", "chebyshev"):
        raise ValueError("grid executor supports smoother='jacobi' or "
                         "'chebyshev' (got %r)" % (smoother,))
    if mlh is None:
        mlh = build_gmg_hierarchy(A, num_levels, dims)
    n_lev = mlh.n_levels
    # interior-point counts per level, coarsest-first (mlh order)
    ndim = len(dims)
    n_of = (lambda m: m) if ndim == 1 else (lambda m: m * m)
    ms = []
    for M in mlh.matrices:
        m_here = M.shape[0] if ndim == 1 else int(round(M.shape[0] ** 0.5))
        if n_of(m_here) != M.shape[0]:
            raise ValueError("level size %d is not a %d-D interior grid"
                             % (M.shape[0], ndim))
        ms.append(m_here)

    from ..ops.fuse import SetupItem, fused_build, passthrough_build
    from ..ops.dense_inverse import inv_from_coo_build

    items: list = []

    def _defer(item):
        items.append(item)
        return len(items) - 1

    plans = []
    for k, M in enumerate(mlh.matrices):
        if k == 0:
            # coarsest: dense inverse only — also when it is the ONLY
            # level (v_cycle_grid then just applies A0_inv; packing a
            # DIA operator for it would upload dead weight)
            plans.append(None)
            continue
        d = M.diagonal()
        d = np.where(d == 0, 1.0, d)
        # host-built DIA streams; the (n_diags, n_pad) table uploads in
        # the fused blob and lands as a passthrough
        Ad = DiaMatrix.from_host_csr(
            HostCSR(M.indptr, M.indices, M.data.astype(dtype), M.shape),
            dtype=dtype)
        diags_host = np.asarray(Ad.diags)
        i_diag = _defer(SetupItem((diags_host,), passthrough_build, ()))
        i_dinv = _defer(SetupItem(((1.0 / d).astype(dtype),),
                                  passthrough_build, ()))
        cheb = None
        if smoother == "chebyshev":
            from .preconditioner import ChebyshevPreconditionerType
            lmax = ChebyshevPreconditionerType().estimate_lmax(M)
            lmin = lmax / 30.0
            cheb = (0.5 * (lmax + lmin), 0.5 * (lmax - lmin))
        plans.append((i_diag, Ad.offsets, M.shape, i_dinv, cheb))

    A0_h = mlh.matrices[0]
    nc = A0_h.shape[0]
    r0, c0, v0 = A0_h.to_coo()
    i_inv = _defer(SetupItem((r0.astype(np.int32), c0.astype(np.int32),
                              v0.astype(dtype)),
                             inv_from_coo_build,
                             (nc, jnp.dtype(dtype).name)))

    outs = fused_build(items)

    levels: List[GridLevel] = []
    for k, plan in enumerate(plans):
        if plan is None:
            levels.append(GridLevel(None, None, None, None))
            continue
        i_diag, offsets, shape, i_dinv, cheb = plan
        A_dev = DiaMatrix(outs[i_diag], offsets, shape)
        levels.append(GridLevel(A_dev, outs[i_dinv], None, cheb))
    return GridHierarchy(levels, outs[i_inv], tuple(ms), ndim,
                         smoother, nu_pre, nu_post)


def v_cycle_grid(h: GridHierarchy, f: jax.Array, x: jax.Array) -> jax.Array:
    """One V-cycle with structured-grid transfers (level loop unrolled;
    same recursion as amg.v_cycle / reference VCycleManager.py:31-62)."""

    def run(k, f_k, x_k):
        if k == 0:
            return h.A0_inv.astype(f_k.dtype) @ f_k
        lev = h.levels[k]
        x_k = _smooth(lev, h.smoother, x_k, f_k, h.nu_pre)
        r = f_k - matvec(lev.A_dev, x_k)
        f_c = grid_restrict(r, h.ndim, h.ms[k], h.ms[k - 1])
        x_c = run(k - 1, f_c, jnp.zeros_like(f_c))
        x_k = x_k + grid_prolong(x_c, h.ndim, h.ms[k - 1], h.ms[k])
        x_k = _smooth(lev, h.smoother, x_k, f_k, h.nu_post)
        return x_k

    return run(h.n_levels - 1, f, x)
