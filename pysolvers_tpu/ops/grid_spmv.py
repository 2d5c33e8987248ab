"""2-D grid-DIA SpMV: the extreme-band kernel for huge structured grids.

The 1-D windowed DIA kernel (ops/spmv.py) materializes an x window of
``tile + band`` per row tile; for a 2-D stencil the band is ±m, so at
m ≳ 15000 (n ≳ 2.25e8) the window expansion 1 + band/tile approaches 3x
the vector — gigabytes of per-matvec copies, then OOM, then the 0.8
Gnnz/s memory-proportional XLA fallback (the round-3 "HBM-scale cliff").

This kernel re-expresses the same operator on the GRID: flat offsets
decompose as off = dr·mc + dc with |dr|, |dc| tiny (a 9-point stencil
has dr, dc ∈ {-1, 0, 1} at ANY m), x is laid out (mr, mc_pad), and a row
tile of R grid rows needs a window of R + 2·dr_max grid rows — the
expansion is (R + 2·dr_max)/R ≈ 1.25 at R=8 regardless of m.  Lane
shifts handle dc exactly like the 1-D kernel's static slices.

Grid semantics == flat semantics iff no stored entry wraps a grid row
(x[r, mc-1+1] is x[r+1, 0] flat but out-of-row on the grid); stencil
assembly never stores such entries, and ``GridDiaMatrix.from_dia``
verifies it numerically before converting.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.device import DiaMatrix


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridDiaMatrix:
    """Stencil operator on an (mr, mc) grid, stored per grid offset.

    diags: (D, mr_pad, mc_o) — diags[d, r, c] multiplies x[r+dr_d, c+dc_d]
    pairs: static ((dr, dc), ...) grid offsets
    dims:  static (mr, mc); shape is the flat (n, n)
    """

    diags: jax.Array
    pairs: tuple = dataclasses.field(metadata=dict(static=True))
    dims: tuple = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.diags.dtype

    @property
    def mc_o(self) -> int:
        return self.diags.shape[2]

    @staticmethod
    def from_dia(A: DiaMatrix, dims, dc_max: int = 8, dr_max: int = 2,
                 row_block: int = 8) -> "GridDiaMatrix":
        """Convert a flat DIA stencil to grid form (host-side repack).

        Refuses (ValueError) when an offset doesn't decompose into
        (|dr| <= dr_max, |dc| <= dc_max), or when a stored value sits on
        a row-wrapping position (grid semantics would drop it)."""
        mr, mc = dims
        n = A.shape[0]
        if mr * mc != n:
            raise ValueError(f"dims {dims} != n={n}")
        diags_h = np.asarray(A.diags)[:, :n]
        pairs = []
        for off in A.offsets:
            dr = int(np.round(off / mc))
            dc = off - dr * mc
            if abs(dr) > dr_max or abs(dc) > dc_max:
                raise ValueError(
                    f"offset {off} = {dr}*mc{dc:+d} outside the grid "
                    f"decomposition window (dr_max={dr_max}, "
                    f"dc_max={dc_max})")
            pairs.append((dr, dc))
        dcm = max(abs(dc) for _, dc in pairs) if pairs else 0
        mc_o = _ceil_to(mc, 128)
        mr_pad = _ceil_to(mr, row_block * 8)
        G = np.zeros((len(pairs), mr_pad, mc_o), dtype=diags_h.dtype)
        for d, (dr, dc) in enumerate(pairs):
            tbl = diags_h[d].reshape(mr, mc)
            # row-wrap check: value at grid col c applies to x col c+dc;
            # out-of-row positions must be zero
            if dc > 0 and np.abs(tbl[:, mc - dc:]).max(initial=0) > 0:
                raise ValueError(f"offset pair {(dr, dc)} has stored "
                                 "values wrapping a grid row")
            if dc < 0 and np.abs(tbl[:, :-dc]).max(initial=0) > 0:
                raise ValueError(f"offset pair {(dr, dc)} has stored "
                                 "values wrapping a grid row")
            # dr out-of-grid rows (top/bottom) are zero by assembly; the
            # kernel's zero row-halo makes them harmless regardless
            G[d, :mr, :mc] = tbl
        return GridDiaMatrix(jnp.asarray(G),
                             tuple((int(a), int(b)) for a, b in pairs),
                             (mr, mc), A.shape)

    @staticmethod
    def from_dia_device(A: DiaMatrix, dims, dc_max: int = 8,
                        dr_max: int = 2, row_block: int = 8
                        ) -> "GridDiaMatrix":
        """Device-side conversion (reshape + pad, no host fetch) for
        operators already resident on device — e.g. GMG levels probed on
        device at n >= 1e8, where a host round trip of the table costs
        gigabytes through the tunnel.

        TRUSTS the caller that no stored value wraps a grid row (true
        for stencil assembly and Galerkin-probed coarse operators; the
        host path ``from_dia`` verifies numerically)."""
        mr, mc = dims
        n = A.shape[0]
        if mr * mc != n:
            raise ValueError(f"dims {dims} != n={n}")
        pairs = []
        for off in A.offsets:
            dr = int(np.round(off / mc))
            dc = off - dr * mc
            if abs(dr) > dr_max or abs(dc) > dc_max:
                raise ValueError(
                    f"offset {off} = {dr}*mc{dc:+d} outside the grid "
                    f"decomposition window")
            pairs.append((int(dr), int(dc)))
        mc_o = _ceil_to(mc, 128)
        mr_pad = _ceil_to(mr, row_block * 8)
        G = jnp.pad(A.diags[:, :n].reshape(len(pairs), mr, mc),
                    ((0, 0), (0, mr_pad - mr), (0, mc_o - mc)))
        return GridDiaMatrix(G, tuple(pairs), (mr, mc), A.shape)


def _gdia_kernel(diags_ref, xw_ref, o_ref, *, pairs, R, dr_max, dc_off,
                 mc_o):
    # diags_ref: (D, R, mc_o); xw_ref: (1, R + 2·dr_max, mc_w);
    # o_ref: (R, mc_o).  x lives at lane offset dc_off in xw.
    acc = jnp.zeros((R, mc_o), dtype=diags_ref.dtype)
    for d, (dr, dc) in enumerate(pairs):
        xs = xw_ref[0, dr_max + dr: dr_max + dr + R,
                    dc_off + dc: dc_off + dc + mc_o]
        acc = acc + diags_ref[d] * xs
    o_ref[...] = acc


def grid_dia_spmv(A: GridDiaMatrix, x: jax.Array,
                  interpret: bool = None) -> jax.Array:
    """y = A @ x for flat planar x of length n = mr·mc.  Jittable; the
    x window costs (R + 2·dr_max)/R ≈ 1.25x the vector, independent of
    the stencil's flat band."""
    mr, mc = A.dims
    n = A.n_rows
    D = len(A.pairs)
    mc_o = A.mc_o
    dr_max = max((abs(dr) for dr, _ in A.pairs), default=0)
    dc_max = max((abs(dc) for _, dc in A.pairs), default=0)
    dc_off = _ceil_to(dc_max, 8) if dc_max else 0
    mc_w = _ceil_to(mc_o + 2 * dc_off, 128)
    mr_pad = A.diags.shape[1]

    # R grid rows per step, sized to scoped VMEM (diags double-buffered)
    vmem_budget = 13 * 1024 * 1024
    R = max((vmem_budget // 4) // (mc_w * (2 * D + 6)) // 8 * 8, 8)
    R = min(R, mr_pad)
    while mr_pad % R:                   # mr_pad is a multiple of 64,
        R -= 8                          # so this terminates at R=8
    n_tiles = mr_pad // R

    # X2: (mr_pad + 2·dr_max rows, mc_w lanes), x interior at
    # [dr_max : dr_max+mr, dc_off : dc_off+mc]
    xg = x.astype(A.dtype).reshape(mr, mc)
    X2 = jnp.zeros((mr_pad + R, mc_w), dtype=A.dtype)
    X2 = X2.at[dr_max: dr_max + mr, dc_off: dc_off + mc].set(xg)
    # windows: xw[t] = X2[t·R : t·R + R + 2·dr_max] via two shifted
    # reshapes (no per-tile slice stack — same trick as the 1-D kernel)
    W = R + 2 * dr_max
    P0 = X2[: n_tiles * R].reshape(n_tiles, R, mc_w)
    P1 = X2[R: n_tiles * R + R].reshape(n_tiles, R, mc_w)
    xw = jnp.concatenate([P0, P1[:, : W - R]], axis=1)   # (n_tiles, W, mc_w)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_gdia_kernel, pairs=A.pairs, R=R,
                              dr_max=dr_max, dc_off=dc_off, mc_o=mc_o),
            grid=(n_tiles,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((D, R, mc_o), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W, mc_w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, mc_o), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mr_pad, mc_o), A.dtype),
        )(A.diags, xw)
    return out[:mr, :mc].reshape(-1)[:n]
