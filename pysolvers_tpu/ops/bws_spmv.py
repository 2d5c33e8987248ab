"""Block-window SELL SpMV kernel (see sparse/bws.py for the format).

Per kernel step (one tile = A.gt groups; default 128 groups = 1024 rows):
  1. slice the tile's x window (win_blocks × 128) from the block-reshaped
     source vector resident in VMEM (aligned dynamic sublane slice);
  2. for each segment s: one-hot select each group's x block
     (MXU (gt, W)·(W, 128)), pick entries with a same-shape 128-lane
     gather, fuse-multiply into the accumulator;
  3. reduce the group_rows×slots slot layout to row sums with a constant
     (128, group_rows) matmul (MXU).

Every primitive here is one this Mosaic backend supports (sublane-aligned
dynamic slices, lane-axis take_along_axis at 128 lanes, matmuls); see the
probe notes in sparse/bws.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.bws import (BwsMatrix, GT, CALL_COST_SLOTS,
                          SELECT_DIV_EXACT, SELECT_DIV_FAST)


def _ceil_to(x, m):
    return ((x + m - 1) // m) * m


def _lane_gather32(x, idx):
    """take_along_axis(x, idx, axis=1) with int32 indices end-to-end.

    Under jax_enable_x64 take_along_axis canonicalizes indices to int64,
    which Mosaic cannot lower; tracing inside a disable_x64 scope keeps the
    emitted gather identical to the x32 form Mosaic supports.
    """
    with jax.enable_x64(False):
        return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)


def _tile_xwin(base_ref, t, x_refs, W: int, W_pad: int):
    """The tile's (W, 128) x window.

    Resident mode (W_pad=0): one whole-vector VMEM ref, aligned dynamic
    sublane slice at the tile base.  Windowed mode: two W_pad-aligned
    blocks DMA'd per tile (BlockSpec index maps read the prefetched
    base), window sliced from their concatenation — removes the
    whole-vector VMEM residency that caps n at ~3.5M f32 (measured:
    scoped-vmem OOM 18.11M vs the 16M limit at n=4.2M)."""
    if not W_pad:
        row0 = pl.multiple_of(base_ref[t], 8)
        return x_refs[0][pl.ds(row0, W), :]
    # base and W_pad are both 8-aligned, so base % W_pad is too
    row0 = base_ref[t] % W_pad
    xcat = jnp.concatenate([x_refs[0][...], x_refs[1][...]], axis=0)
    # dynamic-start slice of a VALUE doesn't lower on this Mosaic
    # backend (only ref pl.ds does); dynamic sublane rotate does.
    # The shift must be spelled POSITIVE: a dynamic negative shift
    # miscompiles on this backend (probe: roll(x, -8) compiled leaves
    # the data unrotated while interpret mode rotates — found by
    # tests/test_tpu_compiled.py; 2*W_pad - row0 is the same rotation)
    return pltpu.roll(xcat, 2 * W_pad - row0, 0)[:W, :]


def _bws_kernel(base_ref, delta_ref, data_ref, lidx_ref, *rest,
                S: int, W: int, group_rows: int, interpret: bool,
                fast_select: bool = False, gt: int = GT, W_pad: int = 0):
    with jax.enable_x64(False):
        o_ref = rest[-1]
        slots = 128 // group_rows
        t = pl.program_id(0)
        # per-tile window base (scalar-prefetched, 8-aligned at pack time;
        # deltas were packed against it)
        xwin = _tile_xwin(base_ref, t, rest[:-1], W, W_pad)  # (W, 128)
        acc = jnp.zeros((gt, 128), dtype=data_ref.dtype)
        wids = jax.lax.broadcasted_iota(jnp.int32, (gt, W), 1)
        # one-hot dots: exact by default (the TPU bf16 default loses 8
        # mantissa bits); fast_select keeps bf16 for preconditioner-grade
        prec = (jax.lax.Precision.DEFAULT if fast_select
                else jax.lax.Precision.HIGHEST)
        for s in range(S):
            d = delta_ref[:, s].reshape(gt, 1)               # (gt, 1)
            onehot = (wids == d).astype(data_ref.dtype)      # (gt, W)
            xsel = jnp.dot(onehot, xwin, precision=prec,
                           preferred_element_type=data_ref.dtype)  # (gt, 128)
            # keep index arithmetic 32-bit even under jax_enable_x64 (Mosaic
            # has no 64-bit support): spell the lane gather at the lax level
            g = _lane_gather32(xsel, lidx_ref[:, s, :])
            acc = acc + data_ref[:, s, :] * g
        # slot reduction: lane l contributes to row l // slots
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, group_rows), 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, group_rows), 1)
        slot_mat = (lanes // slots == rows).astype(acc.dtype)   # (128, group_rows)
        o_ref[...] = jnp.dot(acc, slot_mat, precision=prec,
                             preferred_element_type=acc.dtype)  # (gt, group_rows)




def _bws_kernel_cls(ids_ref, base_ref, delta_ref, data_ref, lidx_ref,
                    *rest,
                    S: int, W: int, group_rows: int, interpret: bool,
                    fast_select: bool = False, gt: int = GT,
                    W_pad: int = 0):
    """Tile-class variant: the tile id comes from the scalar-prefetched
    id list, everything else matches _bws_kernel."""
    o_ref = rest[-1]
    slots = 128 // group_rows
    t = ids_ref[pl.program_id(0)]
    xwin = _tile_xwin(base_ref, t, rest[:-1], W, W_pad)
    acc = jnp.zeros((gt, 128), dtype=data_ref.dtype)
    wids = jax.lax.broadcasted_iota(jnp.int32, (gt, W), 1)
    prec = (jax.lax.Precision.DEFAULT if fast_select
            else jax.lax.Precision.HIGHEST)
    for s in range(S):
        d = delta_ref[:, s].reshape(gt, 1)
        onehot = (wids == d).astype(data_ref.dtype)
        xsel = jnp.dot(onehot, xwin, precision=prec,
                       preferred_element_type=data_ref.dtype)
        g = _lane_gather32(xsel, lidx_ref[:, s, :])
        acc = acc + data_ref[:, s, :] * g
    lanes = jax.lax.broadcasted_iota(jnp.int32, (128, group_rows), 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, group_rows), 1)
    slot_mat = (lanes // slots == rows).astype(acc.dtype)
    o_ref[0] = jnp.dot(acc, slot_mat, precision=prec,
                       preferred_element_type=acc.dtype)


# whole-source-vector VMEM residency is the fast mode (one DMA, reused
# by every tile) but caps n_cols near 3.5M f32 against the 16 MB scoped
# limit; above this budget the kernels switch to per-tile x windows
X2_RESIDENT_BYTES = 12 * 1024 * 1024


def _x_window_mode(x2, W: int):
    """(x2_padded, W_pad): W_pad=0 keeps x2 VMEM-resident; otherwise x2
    is padded so every tile's two W_pad-aligned blocks are in range."""
    if x2.shape[0] * 128 * x2.dtype.itemsize <= X2_RESIDENT_BYTES:
        return x2, 0
    W_pad = _ceil_to(max(W, 8), 8)
    rows_pad = _ceil_to(x2.shape[0], W_pad) + W_pad
    return jnp.pad(x2, ((0, rows_pad - x2.shape[0]), (0, 0))), W_pad


def _bws_call_classes(A, x2, n_groups, interpret):
    """One pallas call per segment class over its (scalar-prefetched) tile
    id list; tiles write compact outputs that are scattered back by tile."""
    group_rows = A.group_rows
    W = A.win_blocks
    gt = A.gt
    n_tiles = n_groups // gt
    x2, W_pad = _x_window_mode(x2, W)
    y = jnp.zeros((n_tiles, gt, group_rows), dtype=A.dtype)
    S = A.n_segments
    for S_c, ids in A.s_classes:
        ids_arr = jnp.asarray(ids, dtype=jnp.int32)
        nt = len(ids)
        # Read a slot PREFIX of the full (n_groups, S, 128) tables
        # straight through the BlockSpec: the block sublane dim must be
        # a multiple of 8 or equal S (Mosaic tiling), so round the
        # class's count up to 8 — extra slots hold zero data (unused
        # segments are zero-filled at pack time) and contribute nothing.
        # The earlier host-side `A.data[:, :S_c, :]` slices materialized
        # a near-full HLO-temp COPY of every table per class (4×340 MB
        # at n=4.2M), which OOM'd the unstructured mixed solve.
        S_k = S if _ceil_to(S_c, 8) >= S else _ceil_to(S_c, 8)
        delta_c = A.delta[:, :S_k]          # (n_groups, S_k) — tiny
        data_c = A.data
        lidx_c = A.lidx
        if W_pad:
            x_specs = [
                pl.BlockSpec((W_pad, 128), lambda i, ids_ref, b:
                             (b[ids_ref[i]] // W_pad, 0)),
                pl.BlockSpec((W_pad, 128), lambda i, ids_ref, b:
                             (b[ids_ref[i]] // W_pad + 1, 0)),
            ]
            x_ops = [x2, x2]
        else:
            x_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
            x_ops = [x2]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((gt, S_k),
                             lambda i, ids_ref, b: (ids_ref[i], 0)),
                pl.BlockSpec((gt, S_k, 128),
                             lambda i, ids_ref, b: (ids_ref[i], 0, 0)),
                pl.BlockSpec((gt, S_k, 128),
                             lambda i, ids_ref, b: (ids_ref[i], 0, 0)),
            ] + x_specs,
            out_specs=pl.BlockSpec((1, gt, group_rows),
                                   lambda i, ids_ref, b: (i, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(_bws_kernel_cls, S=S_k, W=W,
                              group_rows=group_rows, interpret=interpret,
                              fast_select=A.fast_select, gt=gt,
                              W_pad=W_pad),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, gt, group_rows), A.dtype),
            interpret=interpret,
        )(ids_arr, A.base, delta_c, data_c, lidx_c, *x_ops)
        y = y.at[ids_arr].set(out)
    return y.reshape(-1)


def bws_spmv(A: BwsMatrix, x: jax.Array, interpret: bool = None
             ) -> jax.Array:
    """y' = A' @ x' in PERMUTED ordering (x' = x[perm], y = y'[iperm...]).

    ``x`` has length shape[1] (rectangular packs supported — AMG
    transfers); output has length shape[0].  Use ``bws_matvec`` for the
    user-ordering wrapper (square only).
    """
    n = A.shape[0]
    n_cols = A.shape[1]
    n_groups = A.n_groups
    S = A.n_segments
    W = A.win_blocks
    group_rows = A.group_rows
    n_col_blocks = _ceil_to(n_cols, 128) // 128
    # W of trailing zero-padding: the last tiles' windows may run past
    # the final column block (bases are 8-aligned floors)
    x2_rows = n_col_blocks + W
    xp = jnp.zeros((x2_rows * 128,), dtype=A.dtype)
    xp = xp.at[:n_cols].set(x.astype(A.dtype))
    x2 = xp.reshape(x2_rows, 128)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    grid = n_groups // A.gt
    # use per-tile segment classes when the slot savings beat the extra
    # per-call overhead (measured cost model — sparse/bws.py constants)
    use_classes = False
    if len(A.s_classes) > 1:
        slots_classed = sum(s_c * len(ids)
                            for s_c, ids in A.s_classes) * A.gt * 128
        saved = A.nnz_slots - slots_classed
        # include the one-hot select work per processed slot (~W/div
        # slot-equivalents) so the runtime path choice agrees with the
        # cost model the pack geometry was tuned against
        # (sparse/bws.py::kernel_cost)
        sel_div = SELECT_DIV_FAST if A.fast_select else SELECT_DIV_EXACT
        use_classes = (saved * (1.0 + W / sel_div)
                       > CALL_COST_SLOTS * (len(A.s_classes) - 1))
    # the whole pallas_call (grid/block index machinery included) must
    # trace in 32-bit mode — Mosaic cannot lower int64 indices
    with jax.enable_x64(False):
        if use_classes:
            out = _bws_call_classes(A, x2, n_groups, interpret)
        else:
            out = _bws_call(grid, S, W, group_rows, interpret, A, x2,
                            n_groups)
    return out.reshape(-1)[:n]


def _bws_call(grid, S, W, group_rows, interpret, A, x2, n_groups):
    gt = A.gt
    x2, W_pad = _x_window_mode(x2, W)
    if W_pad:
        x_specs = [
            pl.BlockSpec((W_pad, 128), lambda i, b: (b[i] // W_pad, 0)),
            pl.BlockSpec((W_pad, 128), lambda i, b: (b[i] // W_pad + 1, 0)),
        ]
        x_ops = [x2, x2]
    else:
        x_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]   # x2 resident
        x_ops = [x2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((gt, S), lambda i, b: (i, 0)),
            pl.BlockSpec((gt, S, 128), lambda i, b: (i, 0, 0)),
            pl.BlockSpec((gt, S, 128), lambda i, b: (i, 0, 0)),
        ] + x_specs,
        out_specs=pl.BlockSpec((gt, group_rows), lambda i, b: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_bws_kernel, S=S, W=W, group_rows=group_rows,
                          interpret=interpret,
                          fast_select=A.fast_select, gt=gt, W_pad=W_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, group_rows), A.dtype),
        interpret=interpret,
    )(A.base, A.delta, A.data, A.lidx, *x_ops)
    return out


def bws_matvec(A: BwsMatrix, x: jax.Array, interpret: bool = None
               ) -> jax.Array:
    """y = A @ x in the user's ordering (permutes in, unpermutes out)."""
    xp = jnp.take(x, A.perm, axis=0)
    yp = bws_spmv(A, xp, interpret=interpret)
    return jnp.take(yp, A.iperm, axis=0)
