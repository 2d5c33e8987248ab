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


def _bws_kernel(base_ref, delta_ref, data_ref, lidx_ref, x2_ref, o_ref, *,
                S: int, W: int, group_rows: int, interpret: bool,
                fast_select: bool = False, gt: int = GT):
    with jax.enable_x64(False):
        slots = 128 // group_rows
        t = pl.program_id(0)
        # per-tile window base (scalar-prefetched, 8-aligned at pack time;
        # deltas were packed against it)
        row0 = pl.multiple_of(base_ref[t], 8)
        xwin = x2_ref[pl.ds(row0, W), :]                     # (W, 128)
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
                    x2_ref, o_ref,
                    *, S: int, W: int, group_rows: int, interpret: bool,
                    fast_select: bool = False, gt: int = GT):
    """Tile-class variant: the tile id comes from the scalar-prefetched
    id list, everything else matches _bws_kernel."""
    slots = 128 // group_rows
    t = ids_ref[pl.program_id(0)]
    row0 = pl.multiple_of(base_ref[t], 8)
    xwin = x2_ref[pl.ds(row0, W), :]
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


def _bws_call_classes(A, x2, n_groups, interpret):
    """One pallas call per segment class over its (scalar-prefetched) tile
    id list; tiles write compact outputs that are scattered back by tile."""
    group_rows = A.group_rows
    W = A.win_blocks
    gt = A.gt
    n_tiles = n_groups // gt
    y = jnp.zeros((n_tiles, gt, group_rows), dtype=A.dtype)
    for S_c, ids in A.s_classes:
        ids_arr = jnp.asarray(ids, dtype=jnp.int32)
        nt = len(ids)
        # slice to the class's segment count OUTSIDE the kernel: Mosaic
        # requires block dims to divide (8,128) or equal the array dims,
        # so a (gt, S_c) block of the full (n_groups, S) array is illegal.
        # XLA hoists these loop-invariant slices out of solver loops.
        delta_c = A.delta[:, :S_c]
        data_c = A.data[:, :S_c, :]
        lidx_c = A.lidx[:, :S_c, :]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((gt, S_c),
                             lambda i, ids_ref, b: (ids_ref[i], 0)),
                pl.BlockSpec((gt, S_c, 128),
                             lambda i, ids_ref, b: (ids_ref[i], 0, 0)),
                pl.BlockSpec((gt, S_c, 128),
                             lambda i, ids_ref, b: (ids_ref[i], 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, gt, group_rows),
                                   lambda i, ids_ref, b: (i, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(_bws_kernel_cls, S=S_c, W=W,
                              group_rows=group_rows, interpret=interpret,
                              fast_select=A.fast_select, gt=gt),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, gt, group_rows), A.dtype),
            interpret=interpret,
        )(ids_arr, A.base, delta_c, data_c, lidx_c, x2)
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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((gt, S), lambda i, b: (i, 0)),
            pl.BlockSpec((gt, S, 128), lambda i, b: (i, 0, 0)),
            pl.BlockSpec((gt, S, 128), lambda i, b: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x2 resident
        ],
        out_specs=pl.BlockSpec((gt, group_rows), lambda i, b: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_bws_kernel, S=S, W=W, group_rows=group_rows,
                          interpret=interpret,
                          fast_select=A.fast_select, gt=gt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, group_rows), A.dtype),
        interpret=interpret,
    )(A.base, A.delta, A.data, A.lidx, x2)
    return out


def bws_matvec(A: BwsMatrix, x: jax.Array, interpret: bool = None
               ) -> jax.Array:
    """y = A @ x in the user's ordering (permutes in, unpermutes out)."""
    xp = jnp.take(x, A.perm, axis=0)
    yp = bws_spmv(A, xp, interpret=interpret)
    return jnp.take(yp, A.iperm, axis=0)
