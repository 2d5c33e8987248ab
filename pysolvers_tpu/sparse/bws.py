"""Block-window SELL (BWS): the TPU-fast format for unstructured matrices.

Motivation: this backend's Mosaic compiler supports dynamic gather ONLY as
same-shape lane-axis ``take_along_axis`` over 128 lanes (sublane gather and
long lane gather crash it), so classic ELL gather is off the table.  BWS
re-expresses SpMV with exactly the primitives that exist:

* rows are RCM-permuted (native/pst_native.cpp `rcm`) to bound the
  bandwidth, then grouped ``group_rows`` per *group* (one vreg sublane-row,
  group_rows × slots = 128 lanes; geometry auto-selected for fill);
* each group's nnz are partitioned by aligned 128-column block of x; one
  (group, block) pair is a *segment* holding ≤slots nnz per row (heavier
  rows spill to extra segment instances);
* at solve time the kernel selects each segment's x-block from a VMEM
  window with a tiny one-hot matmul (MXU), picks entries with one
  (groups, 128) lane gather, and reduces slot groups with a constant
  (128, 8) matmul.

Replaces the reference's scipy CSR SpMV for FEM-type matrices
(IterativeLinearSolver.py:94-106) with an architecture-native design.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .host import HostCSR

GT = 128                # groups per kernel tile
DEFAULT_GROUP_ROWS = 32  # rows per group; slots per row = 128 // group_rows
# Measured kernel overheads (v5e, DH-15 gt sweep 128/64/32/16: 8.9/15.0/
# 16.0/24.1 us at 491k/393k/360k/338k slots): ~0.4 us per grid step and
# ~1 us per pallas call vs ~1.4e-5 us per slot — expressed in
# slot-equivalents for the geometry cost model.
STEP_COST_SLOTS = 32768
CALL_COST_SLOTS = 65536
# One-hot x-block selection runs gt×W×128 MACs per segment-tile vs
# gt×128 slot work — measured (equal-slot gr=32 W=48 vs gr=64 W=80 pair:
# 5.7 vs 10.1 us) at ~slots·W/49 slot-equivalents with exact
# (Precision.HIGHEST) selects; bf16 fast_select passes are ~4× cheaper.
SELECT_DIV_EXACT = 49
SELECT_DIV_FAST = 196

# structure-keyed symbolic pack plans (see BwsMatrix.host_pack); bounded
_PACK_CACHE: dict = {}


def _ceil_to(x, m):
    return ((x + m - 1) // m) * m


from functools import partial as _partial


def _bws_build(arrs, statics):
    """Device-side materialization of the dense pack arrays from compact
    nnz streams (module-level: the fused-setup jit caches on identity)."""
    vals, pos, lane, delta, perm, iperm, base = arrs
    n_groups, S, dtype_name = statics
    dtype = jnp.dtype(dtype_name)
    flat = n_groups * S * 128
    data = jnp.zeros((flat,), dtype=dtype).at[pos].set(
        vals.astype(dtype)).reshape(n_groups, S, 128)
    lidx = jnp.zeros((flat,), dtype=jnp.int32).at[pos].set(
        lane).reshape(n_groups, S, 128)
    return data, lidx, delta, perm, iperm, base


def _build_classes(used, gt_val):
    """Group tiles (of gt_val groups) by their local max segment count,
    merged down to ≤4 kernel variants."""
    n_tiles = len(used) // gt_val
    tile_s = np.maximum(used.reshape(n_tiles, gt_val).max(axis=1), 1)
    classes = []
    for s_c in sorted(set(int(s) for s in tile_s)):
        ids = tuple(int(t) for t in np.flatnonzero(tile_s == s_c))
        classes.append((s_c, ids))
    while len(classes) > 4:
        # merge the smallest class into the next one up
        sizes = [len(ids) for _, ids in classes]
        i = int(np.argmin(sizes[:-1]))
        s_lo, ids_lo = classes[i]
        s_hi, ids_hi = classes[i + 1]
        classes[i + 1] = (s_hi, tuple(sorted(ids_lo + ids_hi)))
        del classes[i]
    return classes


def _classed_slots(used, gt_val):
    """Kernel slots after ≤4-way class merging at tile size gt_val."""
    return sum(s_c * len(ids)
               for s_c, ids in _build_classes(used, gt_val)) * gt_val * 128


def _auto_geometry(H: HostCSR, perm, fast_select: bool):
    """Stats-only geometry pre-pass: pick (group_rows, gt) from one
    sorted pass over (row, block) pairs — no candidate packs built
    (a full 4-way candidate sweep cost ~0.2 s on DH-15; this is ~0.04 s).

    Mirrors the kernel_cost model: classed slots + per-step/per-call
    overheads + one-hot select work (win_blocks / SELECT_DIV)."""
    n = H.shape[0]
    rows, cols, _ = H.to_coo()
    if perm is not None:
        iperm = np.empty(n, dtype=np.int64)
        iperm[perm] = np.arange(n)
        prows, pcols = iperm[rows], iperm[cols]
    else:
        prows, pcols = rows, cols
    blk = pcols // 128
    nblk = int(blk.max()) + 1 if len(blk) else 1
    key = prows * nblk + blk
    uniq, counts = np.unique(key, return_counts=True)
    urow, ublk = uniq // nblk, uniq % nblk
    # per-row column-block extents (for window width per tile size)
    row_lo = np.full(n, nblk, dtype=np.int64)
    row_hi = np.zeros(n, dtype=np.int64)
    np.minimum.at(row_lo, urow, ublk)
    np.maximum.at(row_hi, urow, ublk + 1)

    sel_div = SELECT_DIV_FAST if fast_select else SELECT_DIV_EXACT
    best = None
    for gr in (8, 16, 32, 64):
        slots_per_row = 128 // gr
        inst = (counts + slots_per_row - 1) // slots_per_row
        n_groups = _ceil_to(n, gr * GT) // gr
        g = urow // gr
        gb_key = g * nblk + ublk
        gb_uniq, gb_inv = np.unique(gb_key, return_inverse=True)
        seg = np.zeros(len(gb_uniq), dtype=np.int64)
        np.maximum.at(seg, gb_inv, inst)          # segments per (group, blk)
        used = np.zeros(n_groups, dtype=np.int64)
        np.add.at(used, gb_uniq // nblk, seg)
        used = np.maximum(used, 1)
        S_est = int(used.max())
        for gt_val in (128, 64, 32, 16, 8):
            if (gt_val * gr) % 128 or n_groups % gt_val:
                continue
            rows_per_tile = gt_val * gr
            n_tiles = n_groups // gt_val
            npad = n_tiles * rows_per_tile
            lo_p = np.full(npad, nblk, dtype=np.int64)
            hi_p = np.zeros(npad, dtype=np.int64)
            lo_p[:n], hi_p[:n] = row_lo, row_hi
            t_lo = lo_p.reshape(n_tiles, rows_per_tile).min(axis=1)
            t_hi = hi_p.reshape(n_tiles, rows_per_tile).max(axis=1)
            t_lo = np.where(t_lo == nblk, 0, t_lo) // 8 * 8
            win = int(_ceil_to(max(int((t_hi - t_lo).max(initial=1)), 1), 8))
            if win > max(256, _ceil_to(H.shape[1], 128) // 128 // 2):
                continue                            # window overflow
            cost = int(_geom_cost(used, gt_val, S_est) * (1 + win / sel_div))
            if best is None or cost < best[0]:
                best = (cost, gr, gt_val)
    if best is None:
        raise ValueError("BWS window overflow (matrix too unbanded); "
                         "use the ELL path")
    return best[1], best[2]


def _geom_cost(used, gt_val, S):
    """Slot-equivalent kernel cost at tile size gt_val: processed slots
    plus per-grid-step and per-call overheads (measured, see module
    constants).  The single-call plain kernel is an alternative; the
    model takes whichever is cheaper, like the runtime path selection."""
    n_tiles = len(used) // gt_val
    classes = _build_classes(used, gt_val)
    classed = (sum(s_c * len(ids) for s_c, ids in classes) * gt_val * 128
               + n_tiles * STEP_COST_SLOTS + len(classes) * CALL_COST_SLOTS)
    plain = (len(used) * S * 128
             + n_tiles * STEP_COST_SLOTS + CALL_COST_SLOTS)
    return min(classed, plain)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BwsMatrix:
    """Device buffers (see module docstring).

    shape may be rectangular (n_rows, n_cols) — e.g. AMG prolongators;
    rectangular packs take the given orderings (use_rcm must be False).

    delta: (n_groups, S) int32   x-window block index per segment
    data:  (n_groups, S, 128)    values   (row r, slot j) at lane 16*r+j
    lidx:  (n_groups, S, 128) int32 ∈ [0,128)  lane of source x entry
    perm:  (n,) int32  row/col permutation applied (x_perm = x[perm])
    iperm: (n,) int32  inverse permutation
    """

    delta: jax.Array
    data: jax.Array
    lidx: jax.Array
    perm: jax.Array
    iperm: jax.Array
    # per-tile x-window base block (n_tiles,) int32, 8-aligned: tile t's
    # window is x2[base[t] : base[t]+W].  Per-tile bases let the window
    # follow the band (smaller W than a global window) and support
    # rectangular matrices (AMG transfer operators), where column
    # position is not tied to row position.
    base: jax.Array = None
    shape: tuple = dataclasses.field(default=None,
                                     metadata=dict(static=True))
    win_blocks: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))
    margin_blocks: int = dataclasses.field(default=0,
                                           metadata=dict(static=True))
    group_rows: int = dataclasses.field(default=DEFAULT_GROUP_ROWS,
                                        metadata=dict(static=True))
    # per-tile segment classes: ((S_class, (tile ids...)), ...).  Tiles are
    # grouped by how many segment slots they actually use, so the kernel
    # runs with S = the class's need instead of the global maximum
    # (a DH-15 pack has S_max 6 but mean ~3.9 — ~35% wasted slots).
    s_classes: tuple = dataclasses.field(default=(),
                                         metadata=dict(static=True))
    # bf16 MXU passes for the one-hot selects (≈6× cheaper than exact f32).
    # Loses ~8 mantissa bits on gathered x values — fine for preconditioner
    # applications, wrong choice for the operator itself.
    fast_select: bool = dataclasses.field(default=False,
                                          metadata=dict(static=True))
    # groups per kernel tile.  Smaller tiles make the per-tile segment
    # classes engage at finer granularity (a tile runs with its own local
    # max segment count instead of the 128-group max) at the cost of more
    # grid steps.  Window slices stay 8-aligned for any gt because deltas
    # are baked against the rounded-down window base at pack time.
    gt: int = dataclasses.field(default=GT, metadata=dict(static=True))

    @property
    def slots(self):
        return 128 // self.group_rows

    @property
    def n_groups(self):
        return self.data.shape[0]

    @property
    def n_segments(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz_slots(self):
        return self.data.shape[0] * self.data.shape[1] * 128

    @property
    def classed_slots(self):
        """Slots the kernel actually processes (class path when it wins)."""
        base = self.nnz_slots
        if len(self.s_classes) > 1:
            classed = sum(s_c * len(ids)
                          for s_c, ids in self.s_classes) * self.gt * 128
            return min(base, classed)
        return base

    @property
    def kernel_cost(self):
        """Slot-equivalent cost incl. MXU select work and per-step /
        per-call overheads (measured model, module constants)."""
        n_tiles = self.n_groups // self.gt
        sel_div = SELECT_DIV_FAST if self.fast_select else SELECT_DIV_EXACT
        sel = self.win_blocks / sel_div
        base = (int(self.nnz_slots * (1 + sel))
                + n_tiles * STEP_COST_SLOTS + CALL_COST_SLOTS)
        if len(self.s_classes) > 1:
            cl_slots = sum(s_c * len(ids)
                           for s_c, ids in self.s_classes) * self.gt * 128
            classed = (int(cl_slots * (1 + sel))
                       + n_tiles * STEP_COST_SLOTS
                       + len(self.s_classes) * CALL_COST_SLOTS)
            return min(base, classed)
        return base

    @staticmethod
    def _rcm_perm(H: HostCSR):
        """RCM permutation of the symmetrized adjacency (or None)."""
        from ..utils import native
        p = native.sym_rcm(H.indptr, H.indices, H.shape[0])
        if p is None:
            # fallback: symmetrize on host (two numpy lexsorts), plain RCM
            Hs = H.add(H.transpose())
            p = native.rcm(Hs.indptr, Hs.indices, H.shape[0])
        return np.asarray(p, dtype=np.int64) if p is not None else None

    @staticmethod
    def from_host_csr(H: HostCSR, dtype=np.float32, use_rcm: bool = True,
                      group_rows: int = None,
                      fast_select: bool = False,
                      gt: int = None, _device: bool = True,
                      _perm=None) -> "BwsMatrix":
        """Pack; ``group_rows`` in {8,16,32,64} (None = auto: try all, keep
        the geometry with the fewest padded slots).  ``gt`` = groups per
        kernel tile; None or "auto" = the measured-cost minimizer (slots
        plus per-step/per-call overheads) when ``group_rows`` is auto,
        else the 128-group default.  Pin both to force a geometry."""
        if not _device:
            return BwsMatrix._pack(H, dtype, use_rcm, group_rows,
                                   fast_select, gt, _perm, defer=False)
        from ..ops.fuse import fused_build
        item, assemble, _ = BwsMatrix.host_pack(H, dtype, use_rcm,
                                                group_rows, fast_select,
                                                gt, _perm)
        (out,) = fused_build([item])
        return assemble(out)

    @staticmethod
    def host_pack(H: HostCSR, dtype=np.float32, use_rcm: bool = True,
                  group_rows: int = None, fast_select: bool = False,
                  gt: int = None, _perm=None):
        """Host-side pack returning ``(SetupItem, assemble, perm)`` for
        the one-dispatch fused setup (ops/fuse.py): ``assemble(outputs)``
        yields the BwsMatrix once ``fused_build`` ran the item; ``perm``
        is the host-side row permutation (callers often need it to build
        the permuted host matrix before the fused dispatch runs).

        Symbolic/numeric split: the pack PLAN (RCM, geometry sweep,
        segment layout, index streams) depends only on the sparsity
        structure, so it is cached on a structure hash — a same-structure
        re-pack (Newton steps re-streaming Jacobian values, AMG hierarchy
        rebuilds, repeated solver setups) only gathers the new values
        into the cached nnz order.  HostCSR index arrays are treated as
        immutable (the standard analyze-once/factor-many contract)."""
        pk = None if _perm is None else hash(np.asarray(_perm).tobytes())
        # nnz rides alongside the two content hashes so a (vanishingly
        # unlikely) 64-bit collision can't silently return a wrong plan
        # for a different-size structure
        key = (hash(H.indptr.tobytes()), hash(H.indices.tobytes()),
               H.nnz, H.shape, np.dtype(dtype).str, use_rcm, group_rows,
               fast_select, gt, pk)
        ent = _PACK_CACHE.get(key)
        from ..ops.fuse import DeviceCached, SetupItem
        if ent is not None:
            tail_dc, build, statics, assemble, perm, order_full = ent
            vals = np.ascontiguousarray(H.data[order_full]).astype(
                dtype, copy=False)
            return SetupItem((vals,) + tail_dc, build, statics), \
                assemble, perm
        item, assemble, perm, order_full = BwsMatrix._pack(
            H, dtype, use_rcm, group_rows, fast_select, gt, _perm,
            defer=True)
        # the index/plan streams are STRUCTURE: wrap them DeviceCached
        # (hash precomputed once here) so fused_build keeps them
        # device-resident and warm re-setups ship only the values —
        # post-first-fetch uploads on this tunnel run at ~40 MB/s
        # (ops/fuse.py), so structure bytes are the setup tax
        tail_dc = tuple(DeviceCached(a) for a in item.arrays[1:])
        item = SetupItem((item.arrays[0],) + tail_dc, item.build,
                         item.statics)
        if len(_PACK_CACHE) > 32:
            _PACK_CACHE.pop(next(iter(_PACK_CACHE)))
        _PACK_CACHE[key] = (tail_dc, item.build, item.statics,
                            assemble, perm, order_full)
        return item, assemble, perm

    @staticmethod
    def _pack(H: HostCSR, dtype, use_rcm, group_rows, fast_select, gt,
              _perm, defer: bool):
        # validate BEFORE the RCM/geometry pre-pass: a wide rectangular
        # matrix would crash _auto_geometry with a raw IndexError
        # (iperm[cols] out of bounds) instead of this message, and an
        # empty matrix would crash _pack's key reductions
        if H.shape[0] != H.shape[1] and use_rcm:
            raise ValueError("rectangular BWS packs take the given "
                             "orderings; pass use_rcm=False")
        if H.nnz == 0:
            raise ValueError("cannot pack an empty (zero-nnz) matrix "
                             "into BWS")
        if group_rows is None:
            # stats-only geometry pre-pass: pick (group_rows, gt) from
            # per-(row, block) counts without building candidate packs
            # (and without shipping anything to the device); only the
            # winner is packed and materialized.  RCM is computed once.
            perm = BwsMatrix._rcm_perm(H) if use_rcm else None
            gr_win, gt_win = _auto_geometry(H, perm, fast_select)
            return BwsMatrix._pack(
                H, dtype, use_rcm, gr_win, fast_select,
                gt_win if gt in (None, "auto") else gt,
                perm, defer)
        GROUP_ROWS = group_rows
        SLOTS = 128 // group_rows
        n = H.shape[0]
        n_cols = H.shape[1]
        # ---- permutation (bandwidth reduction; square only) ----
        perm = _perm
        if perm is None and use_rcm:
            perm = BwsMatrix._rcm_perm(H)
        if perm is None:
            perm = np.arange(n, dtype=np.int64)
        iperm = np.empty(n, dtype=np.int64)
        iperm[perm] = np.arange(n)

        rows, cols, vals = H.to_coo()
        prows = iperm[rows]
        pcols = iperm[cols] if n == n_cols else cols

        # ---- group/segment packing ----
        n_rows_pad = _ceil_to(n, GROUP_ROWS * GT)
        n_groups = n_rows_pad // GROUP_ROWS
        grp = prows // GROUP_ROWS
        sub = prows % GROUP_ROWS
        blk = pcols // 128
        lane = pcols % 128

        # order nnz by (group, block, subrow) to lay out segments
        order = np.lexsort((lane, sub, blk, grp))
        grp, sub, blk, lane, vals = (grp[order], sub[order], blk[order],
                                     lane[order], vals[order])

        # slot index within (group, block, subrow): cumulative count
        key = (grp * (blk.max() + 2) + blk) * GROUP_ROWS + sub
        first = np.ones(len(key), dtype=bool)
        first[1:] = key[1:] != key[:-1]
        start_of_run = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        slot = np.arange(len(key)) - start_of_run[run_id]
        # rows needing >SLOTS nnz in one block spill to an extra instance
        inst = slot // SLOTS
        slot = slot % SLOTS

        # re-sort so each (group, block, instance) is one contiguous run
        # (instances of different subrows would otherwise interleave)
        order2 = np.lexsort((lane, sub, inst, blk, grp))
        # composite CSR-order -> stream-order map (the cached symbolic
        # plan re-streams new values with this single gather)
        order_full = order[order2]
        grp, sub, blk, lane, vals, inst, slot = (
            grp[order2], sub[order2], blk[order2], lane[order2],
            vals[order2], inst[order2], slot[order2])

        # segment = unique (group, block, instance); index within group
        seg_key = (grp * (blk.max() + 2) + blk) * (inst.max() + 1) + inst
        seg_first = np.ones(len(seg_key), dtype=bool)
        seg_first[1:] = seg_key[1:] != seg_key[:-1]
        seg_id_global = np.cumsum(seg_first) - 1
        # per-group segment counter
        seg_starts = np.flatnonzero(seg_first)
        seg_grp = grp[seg_starts]
        gfirst = np.ones(len(seg_grp), dtype=bool)
        gfirst[1:] = seg_grp[1:] != seg_grp[:-1]
        gstart = np.flatnonzero(gfirst)
        g_run = np.cumsum(gfirst) - 1
        seg_in_grp = np.arange(len(seg_grp)) - gstart[g_run]
        S = int(seg_in_grp.max()) + 1 if len(seg_in_grp) else 1
        seg_of_nnz = seg_in_grp[seg_id_global]

        # ---- tile size selection ----
        # a tile must cover whole 128-column blocks of output rows
        gt_candidates = [g for g in (128, 64, 32, 16, 8)
                         if (g * GROUP_ROWS) % 128 == 0 and n_groups % g == 0]
        if gt == "auto":
            gt_val = None      # chosen below from per-group segment usage
        elif gt is None:
            gt_val = GT if GT in gt_candidates else gt_candidates[0]
        else:
            if gt not in gt_candidates:
                raise ValueError(f"gt={gt} invalid for group_rows="
                                 f"{GROUP_ROWS}, n_groups={n_groups} "
                                 f"(candidates: {gt_candidates})")
            gt_val = gt

        # per-group used-segment counts (for class construction / gt pick)
        used = np.zeros(n_groups, dtype=np.int64)
        if len(seg_grp):
            np.maximum.at(used, seg_grp, seg_in_grp + 1)
        used = np.maximum(used, 1)
        if gt_val is None:
            S_est = int(used.max())
            best = None
            for g in gt_candidates:
                cost = _geom_cost(used, g, S_est)
                if best is None or cost < best[0] or (cost == best[0]
                                                     and g > best[1]):
                    best = (cost, g)
            gt_val = best[1]

        # ---- window geometry (per-tile bases) ----
        # each tile's x-window starts at the 8-aligned floor of the
        # smallest column block any of its nnz touches (Mosaic needs
        # 8-aligned dynamic sublane slices); deltas are packed against
        # that base.  The window follows the band instead of assuming
        # column position tracks row position, which both shrinks W and
        # admits rectangular matrices.
        n_tiles = n_groups // gt_val
        tile_of_nnz = grp // gt_val
        base_t = np.full(n_tiles, np.iinfo(np.int64).max, dtype=np.int64)
        hi_t = np.zeros(n_tiles, dtype=np.int64)
        if len(blk):
            np.minimum.at(base_t, tile_of_nnz, blk)
            np.maximum.at(hi_t, tile_of_nnz, blk + 1)
        base_t = np.where(base_t == np.iinfo(np.int64).max, 0, base_t)
        base_t = base_t // 8 * 8
        margin_blocks = 0
        win_blocks = int(_ceil_to(max(int((hi_t - base_t).max(initial=1)),
                                      1), 8))
        if win_blocks > max(256, _ceil_to(n_cols, 128) // 128 // 2):
            raise ValueError("BWS window overflow (matrix too unbanded); "
                             "use the ELL path")
        delta_vals = blk - base_t[tile_of_nnz]

        # ---- fill device arrays ----
        # the dense (n_groups, S, 128) data/lidx arrays are mostly padding
        # (DH-15: ~8% fill), so shipping them dense wastes ~12× upload
        # bandwidth through a remote tunnel.  Upload the compact nnz
        # streams instead and scatter ON DEVICE in one jitted dispatch
        # (lane indices travel as uint8 and widen to int32 in XLA — the
        # Mosaic int8 *kernel load* bug doesn't apply outside Pallas).
        lanepos = sub * SLOTS + slot
        pos = (grp * S + seg_of_nnz) * 128 + lanepos
        pos = pos.astype(np.int32) if n_groups * S * 128 < 2 ** 31 \
            else pos
        delta = np.zeros((n_groups, S), dtype=np.int32)
        delta[grp, seg_of_nnz] = delta_vals
        # unused segments point at the (zeroed) window row 0 — data is 0 so
        # any lane is safe

        # per-tile segment classes (tiles of gt_val groups)
        classes = _build_classes(used, gt_val)

        if defer:
            from ..ops.fuse import SetupItem
            shape, win, margin = (n, n_cols), int(win_blocks), \
                int(margin_blocks)
            classes_t, gtv, gr = tuple(classes), int(gt_val), group_rows
            item = SetupItem(
                arrays=(vals.astype(dtype), pos,
                        lane.astype(np.uint8), delta,
                        perm.astype(np.int32), iperm.astype(np.int32),
                        base_t.astype(np.int32)),
                build=_bws_build,
                statics=(int(n_groups), int(S), jnp.dtype(dtype).name))

            def assemble(out):
                data, lidx, delta_d, perm_d, iperm_d, base_d = out
                return BwsMatrix(delta_d, data, lidx, perm_d, iperm_d,
                                 base_d, shape, win, margin, gr,
                                 classes_t, fast_select, gtv)

            return item, assemble, perm, order_full
        data = np.zeros((n_groups, S, 128), dtype=dtype)
        lidx = np.zeros((n_groups, S, 128), dtype=np.int32)
        data[grp, seg_of_nnz, lanepos] = vals
        lidx[grp, seg_of_nnz, lanepos] = lane
        return BwsMatrix(
            delta, data, lidx,
            perm.astype(np.int32),
            iperm.astype(np.int32),
            base_t.astype(np.int32),
            (n, n_cols), int(win_blocks), int(margin_blocks), group_rows,
            tuple(classes), fast_select, int(gt_val))
