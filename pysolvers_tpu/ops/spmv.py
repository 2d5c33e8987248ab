"""Sparse matrix–vector product kernels (the framework's hottest op).

Replaces the reference's delegation to scipy's C CSR SpMV
(PySolvers/Linear/IterativeLinearSolver.py:94-106 ``mvmult``; used in every
solver hot loop, e.g. PCGSolver.py:111).

Three TPU execution strategies, dispatched by matrix format:

1. ``DiaMatrix`` → shift-and-fma over static diagonal offsets.  Gather-free,
   HBM-bandwidth-bound at ~4 bytes/nnz: the speed-of-light path for FD
   stencils.  Pallas kernel, row-tiled, with the source vector window in VMEM.

2. ``BwsMatrix`` (ops/bws_spmv.py) → block-window SELL Pallas kernel for
   unstructured matrices: RCM-permuted rows, MXU one-hot block selection,
   128-lane gather.  Opt-in via ``BwsMatrix.from_host_csr`` (f32).

3. ``EllMatrix`` → XLA gather fallback: correct for every dtype (incl.
   f64) and any sparsity; the safety net the other paths fall back to.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.device import DiaMatrix, EllMatrix


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret_mode() -> bool:
    """Pallas kernels compile only on TPU; elsewhere run interpreted (tests
    on the virtual CPU mesh still exercise the kernel logic)."""
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# XLA fallback: padded-ELL gather (works for all dtypes incl. float64)
# ---------------------------------------------------------------------------

def ell_spmv_xla(A: EllMatrix, x: jax.Array) -> jax.Array:
    """General SpMV via XLA gather; correct for every dtype and shape."""
    n = A.n_rows
    # +1 slot: padding columns use the sentinel index n_cols (zero there)
    xp = jnp.zeros((max(A.n_cols_pad, A.n_cols + 1),), dtype=x.dtype)
    xp = xp.at[: A.n_cols].set(x[: A.n_cols])
    g = jnp.take(xp, A.cols, axis=0)
    y = jnp.sum(A.data * g, axis=1)
    return y[:n]


def ell_spmv_f64_splitgather(A: EllMatrix, x: jax.Array) -> jax.Array:
    """f64 ELL SpMV whose gathers run on the fast f32 vector path.

    On TPU f64 is emulated: elementwise emulated-f64 arithmetic is
    vectorized and cheap, but XLA lowers an f64 *gather* onto the scalar
    path (measured ~0.5 s for one DH-15 SpMV — it dominated whole
    solves).  Fix: split x into hi/lo f32 planes (xh = f32(x),
    xl = f32(x - xh) — captures x to ~2^-48 relative), gather each with
    the fast f32 vector gather, and rebuild g = f64(gh) + f64(gl)
    exactly; products/accumulation stay full f64 against the f64 data.

    Used for the in-graph high-precision residuals of the one-dispatch
    refinement chain (linear/refine.py::dd-chain); accuracy ~2^-48·kappa
    instead of f64's 2^-53·kappa, which a host-verified final residual
    covers.
    """
    n = A.n_rows
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
    npad = max(A.n_cols_pad, A.n_cols + 1)
    xph = jnp.zeros((npad,), jnp.float32).at[: A.n_cols].set(xh[: A.n_cols])
    xpl = jnp.zeros((npad,), jnp.float32).at[: A.n_cols].set(xl[: A.n_cols])
    g = (jnp.take(xph, A.cols, axis=0).astype(jnp.float64)
         + jnp.take(xpl, A.cols, axis=0).astype(jnp.float64))
    y = jnp.sum(A.data.astype(jnp.float64) * g, axis=1)
    return y[:n]


def ellt_spmv_f64_splitgather(A, x: jax.Array) -> jax.Array:
    """``ell_spmv_f64_splitgather`` on the SLOT-MAJOR layout
    (sparse.device.EllTMatrix): one flat 1-D vector-path gather per slot
    stream instead of an (n, k) gather whose minor-k result tiles to
    128/k times its data (the 2 GB-per-buffer OOM at n=4.2M).  Same
    hi/lo split accuracy (~2^-48 relative capture of x)."""
    n = A.n_rows
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
    npad = max(A.n_cols_pad, A.n_cols + 1)
    xph = jnp.zeros((npad,), jnp.float32).at[: A.n_cols].set(xh[: A.n_cols])
    xpl = jnp.zeros((npad,), jnp.float32).at[: A.n_cols].set(xl[: A.n_cols])
    y = jnp.zeros((A.n_rows_pad,), jnp.float64)
    for s in range(A.k):
        g = (jnp.take(xph, A.cols_t[s]).astype(jnp.float64)
             + jnp.take(xpl, A.cols_t[s]).astype(jnp.float64))
        y = y + A.data_t[s].astype(jnp.float64) * g
    return y[:n]


# ---------------------------------------------------------------------------
# DIA pallas kernel: y = sum_d diag_d * shift(x, off_d)
# ---------------------------------------------------------------------------

def _dia_kernel(diags_ref, xw_ref, o_ref, *, offsets, tile, pad_lo):
    # xw_ref block: (8, wlen) — 8 consecutive row-tiles' x windows.  Each
    # diagonal is a static lane-offset slice of the window (the same
    # pattern Mosaic compiled for the (1, N) variant, now on 8 sublanes).
    acc = jnp.zeros(o_ref.shape, dtype=diags_ref.dtype)
    for d, off in enumerate(offsets):
        xs = xw_ref[:, off + pad_lo: off + pad_lo + tile]
        acc = acc + diags_ref[d] * xs
    o_ref[...] = acc


def _dia_tile_plan(D: int, band: int, n_store: int, tile: int = 32768):
    """Kernel tile choice for a DIA SpMV over ``n_store`` stored rows.

    Returns None when the band is too wide for the windowed kernel
    (extreme-band XLA fallback).  Shared between the kernel and
    ``prep_operator`` so a prepped layout always matches the tile the
    kernel would pick.

    Sizing rules (measured):
    * shrink the tile for small systems so padding to tile*8 rows
      doesn't multiply the streamed bytes; keep lanes >= 128;
    * clamp so each grid step's buffers fit scoped VMEM: the streamed
      diags block is DOUBLE-buffered by the pipeline (2·D), window +
      out add ~4 more tile-rows; Mosaic's actual scoped allocation runs
      ~15% above this model (kernel stack/slicing temps — measured
      19.3 MB where the model said 16.7), so budget 13 MB against the
      16 MB scoped limit;
    * bigger tiles win until the VMEM wall (8k: 86, 16k: 101, 32k: 107
      Gnnz/s on v5e); a 9-offset probed GMG level at n=10^6 previously
      requested 18 MB scoped and failed to compile;
    * power-of-two multiple of 128: DiaMatrix pads its rows to the
      262144 grid at pack time, and any power-of-two tile <= 32768
      divides it — the kernel's alignment pad becomes a no-op.
    """
    vmem_budget = 13 * 1024 * 1024
    tile_cap = max(
        (vmem_budget // 4 - 2 * 8 * band) // (8 * (2 * D + 4))
        // 128 * 128, 128)
    if band > 2 * tile_cap:
        # the kernel's windowed-x copy costs n·(1 + band/tile) floats;
        # past band ≈ 2·tile that HBM expansion dominates (a 2-D
        # Laplacian at m=17000, n=2.9e8 needed +4.2 GB of windows and
        # OOM'd HBM)
        return None
    tile = max(128, min(tile, tile_cap, _ceil_to((n_store + 7) // 8, 128)))
    t = 128
    while t * 2 <= tile:
        t *= 2
    return t


def prep_operator(A):
    """Lay an operator out in its SpMV kernel's native form, ONCE.

    DiaMatrix → DiaTiled: the kernel consumes (D, n_tiles, tile), and
    XLA materializes that reshape as a full copy of the diagonals at
    EVERY call because the 2-D and 3-D tilings differ physically — and
    does not hoist it out of while/fori solver loops (measured 2x
    whole-matvec cost at n=2.1M).  Call this at the top of a jitted
    solve (traced once, outside the iteration loop) or at setup time
    for stored operators (AMG/GMG hierarchy levels).

    Everything else (Ell/BWS/BDIA/dense/operators) passes through —
    their stored layouts already match their kernels.
    """
    from ..sparse.device import DiaTiled
    if not isinstance(A, DiaMatrix):
        return A
    if A.dtype != jnp.float32:
        return A       # f64/other ride the XLA 2-D path — no kernel form
    offsets = A.offsets
    if len(offsets) == 0:
        return A
    pad_lo = max(0, -min(offsets))
    pad_hi = max(0, max(offsets))
    tile = _dia_tile_plan(len(offsets), pad_lo + pad_hi, A.diags.shape[1])
    if tile is None:
        return A                      # extreme band: XLA path keeps 2-D
    n_pad = _ceil_to(A.diags.shape[1], tile * 8)
    diags = A.diags
    if diags.shape[1] != n_pad:
        diags = jnp.pad(diags, ((0, 0), (0, n_pad - diags.shape[1])))
    return DiaTiled(diags.reshape(len(offsets), n_pad // tile, tile),
                    offsets, A.shape)


def dia_spmv_pallas(A, x: jax.Array, tile: int = 32768,
                    interpret: bool = None) -> jax.Array:
    """Row-tiled diagonal SpMV at ~4·n_diags bytes/nnz of HBM traffic.

    Rows are split into tiles of ``tile``; tiles are grouped 8 per kernel
    step so the VPU runs on full (8, tile) vregs.  Each tile's x window
    (tile + band) is materialized once outside the kernel (static slices,
    one fused XLA copy) and streamed through VMEM by the Pallas pipeline.

    ``A`` may be a DiaMatrix or a prepped DiaTiled (see prep_operator —
    passing DiaMatrix inside an iteration loop pays a per-call layout
    copy of the diagonals).
    """
    from ..sparse.device import DiaTiled
    n = A.n_rows
    offsets = A.offsets
    pad_lo = max(0, -min(offsets))
    pad_hi = max(0, max(offsets))
    D = len(offsets)

    if isinstance(A, DiaTiled):
        diags3 = A.diags3
        tile = A.tile
        n_tiles = diags3.shape[1]
    else:
        tile = _dia_tile_plan(D, pad_lo + pad_hi, A.diags.shape[1], tile)
        if tile is None:
            return dia_spmv_xla(A, x)   # extreme band (see _dia_tile_plan)
        n_pad = _ceil_to(A.diags.shape[1], tile * 8)
        n_tiles = n_pad // tile
        diags = A.diags
        if diags.shape[1] != n_pad:
            diags = jnp.pad(diags, ((0, 0), (0, n_pad - diags.shape[1])))
        diags3 = diags.reshape(D, n_tiles, tile)
    n_pad = n_tiles * tile

    wlen = _ceil_to(tile + pad_lo + pad_hi, 128)
    # windowed view: xw[t] = xp[t*tile : t*tile + wlen], built from
    # ceil(wlen/tile) RESHAPED pieces concatenated along the window axis
    # — piece j is reshape(xp[j*tile:], (n_tiles, tile)), so xw costs
    # O(band/tile) fused copies regardless of n_tiles.  (The previous
    # per-tile jnp.stack of n_tiles slices stopped fusing at scale:
    # 5.6k slices at n=1.4e8 ran ~1.4 s/matvec — pure launch overhead.)
    k_pieces = -(-wlen // tile)
    # x has length shape[1] (rectangular operators: GMG/AMG transfers)
    xp = jnp.zeros((max(n_pad + k_pieces * tile, pad_lo + A.shape[1]),),
                   dtype=A.dtype)
    xp = xp.at[pad_lo: pad_lo + A.shape[1]].set(x.astype(A.dtype))
    xw = jnp.concatenate(
        [jax.lax.slice(xp, (j * tile,),
                       (j * tile + n_tiles * tile,)).reshape(n_tiles, tile)
         for j in range(k_pieces)], axis=1)[:, :wlen]

    grid = n_tiles // 8
    if interpret is None:
        interpret = _interpret_mode()
    # trace the call (incl. grid/index machinery) in 32-bit mode: under
    # jax_enable_x64 large-n index scalars become int64, which Mosaic
    # cannot legalize (observed at n=2.1M: "func.return (i64, i32, i64)")
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_dia_kernel, offsets=offsets, tile=tile,
                              pad_lo=pad_lo),
            grid=(grid,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((D, 8, tile), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, wlen), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, tile), A.dtype),
        )(diags3, xw)
    return out.reshape(-1)[:n]


def dia_spmv_xla(A: DiaMatrix, x: jax.Array) -> jax.Array:
    """Shift-and-fma SpMV in plain jnp (XLA fuses the static slices)."""
    n = A.n_rows
    n_cols = A.shape[1]
    n_pad = A.diags.shape[1]
    pad_lo = max(0, -min(A.offsets))
    # pad against x's length (= n_cols), NOT the row count: a tall
    # rectangular operator (e.g. a GMG prolongator) under-padded here and
    # dynamic_slice silently CLAMPED the out-of-bounds start (wrong values)
    pad_hi = max(0, max(0, max(A.offsets)) + n_pad - n_cols)
    xp = jnp.concatenate([
        jnp.zeros(pad_lo, x.dtype), x.astype(A.dtype),
        jnp.zeros(pad_hi, A.dtype)])
    acc = jnp.zeros(n_pad, dtype=jnp.result_type(A.dtype, x.dtype))
    for d, off in enumerate(A.offsets):
        acc = acc + A.diags[d] * jax.lax.dynamic_slice(
            xp, (off + pad_lo,), (n_pad,))
    return acc[:n]


def _bdia_kernel(planes_ref, xw_ref, o_ref, *, offsets, b, tile, pad_lo):
    # planes_ref: (D·b, b, tile); xw_ref: (1, b, wlen); o_ref:
    # (b, tile).  For each block offset d and source dof q: FMA the
    # contiguous (b, tile) plane slab against dof-q's shifted x window
    # row, broadcast over the p sublanes — zero gathers, zero transposes.
    acc = jnp.zeros((b, tile), dtype=planes_ref.dtype)
    for d, off in enumerate(offsets):
        xs = xw_ref[0, :, off + pad_lo: off + pad_lo + tile]   # (b, tile)
        for q in range(b):
            acc = acc + planes_ref[d * b + q] * xs[q:q + 1, :]
    o_ref[...] = acc


def bdia_spmv_pallas(A, x: jax.Array, tile: int = 16384,
                     interpret: bool = None) -> jax.Array:
    """Planar block-DIA SpMV Pallas kernel (sparse/bdia.py layout):
    y[p·nb+i] = Σ_d Σ_q planes[d·b+q, p, i] · x[q·nb + i + off_d].

    x is PLANAR-ordered (all dof-0 values first).  Row tiles of the
    block-row axis stream through VMEM like dia_spmv_pallas; each tile's
    per-dof x windows (b, tile + band) are materialized once outside the
    kernel."""
    b, nb = A.b, A.nb
    nb_pad = A.nb_pad
    offsets = A.offsets
    pad_lo = max(0, -min(offsets))
    pad_hi = max(0, max(offsets))
    D = len(offsets)

    # the pipeline DOUBLE-buffers the streamed planes block (2·D·b tile-
    # rows of b), and inside solver loops XLA places the kernel's FULL
    # (b, nb_pad) output in VMEM (S(1) — the loop residency that speeds
    # the DIA path), which counts against the same 16 MB scoped limit.
    # Reserve for it explicitly: the old (D·b + 2) model ignored both
    # and compiles died with 17-25 MB scoped allocations (b=5, D=5,
    # nb=420k).  XLA only attempts the residency when the output fits,
    # so the reserve is capped.
    out_resident = min(b * nb_pad * 4, 9 * 1024 * 1024)
    vmem_budget = max(15 * 1024 * 1024 - out_resident, 3 * 1024 * 1024)
    tile_cap = max(
        (vmem_budget // (4 * b * (2 * D * b + 4))) // 128 * 128, 128)
    tile = max(128, min(tile, tile_cap, _ceil_to(nb_pad, 128)))
    # power-of-two tile <= 16384 divides the pack-time nb_pad grid
    # (sparse/bdia.py) — keeps the alignment pad below a no-op
    t = 128
    while t * 2 <= tile:
        t *= 2
    tile = t
    npad2 = _ceil_to(nb_pad, tile)
    n_tiles = npad2 // tile
    planes = A.planes
    if planes.shape[-1] != npad2:
        planes = jnp.pad(planes,
                         ((0, 0), (0, 0), (0, npad2 - planes.shape[-1])))

    wlen = _ceil_to(tile + pad_lo + pad_hi, 128)
    xb = x.astype(A.dtype).reshape(b, nb)
    xp = jnp.zeros((b, npad2 + wlen - tile + pad_lo), dtype=A.dtype)
    xp = xp.at[:, pad_lo: pad_lo + nb].set(xb)
    xw = jnp.stack([jax.lax.slice(xp, (0, t * tile),
                                  (b, t * tile + wlen))
                    for t in range(n_tiles)])        # (n_tiles, b, wlen)

    if interpret is None:
        interpret = _interpret_mode()
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_bdia_kernel, offsets=offsets, b=b,
                              tile=tile, pad_lo=pad_lo),
            grid=(n_tiles,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((D * b, b, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, wlen), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, npad2), A.dtype),
        )(planes, xw)
    return out[:, :nb].reshape(b * nb)


def _bdia_xla(A, xb: jax.Array):
    """(b, nb_pad[, k]) planar shift-and-FMA in plain jnp (fallback for
    f64 and non-TPU backends; also the SpMM path)."""
    b = A.b
    nb_pad = A.nb_pad
    pad_lo = max(0, -min(A.offsets))
    pad_hi = max(0, max(A.offsets))
    pad = [(0, 0), (pad_lo, pad_hi)] + [(0, 0)] * (xb.ndim - 2)
    xp = jnp.pad(xb, pad)
    acc = jnp.zeros_like(xb)
    for d, off in enumerate(A.offsets):
        start = (0, off + pad_lo) + (0,) * (xb.ndim - 2)
        xs = jax.lax.dynamic_slice(xp, start, xb.shape)
        for q in range(b):
            pl_dq = A.planes[d * b + q]          # (b, nb_pad)
            if xb.ndim == 3:
                pl_dq = pl_dq[..., None]
            acc = acc + pl_dq * xs[q:q + 1]
    return acc


def bdia_spmv(A, x: jax.Array) -> jax.Array:
    """Planar block-DIA SpMV (dispatching Pallas on TPU f32, XLA
    shift-and-FMA elsewhere).  x and y are PLANAR-ordered — reorder once
    per solve with BdiaMatrix.to_planar/from_planar."""
    b, nb = A.b, A.nb
    if A.dtype == jnp.float32 and not _interpret_mode():
        return bdia_spmv_pallas(A, x)
    xb = jnp.zeros((b, A.nb_pad), dtype=jnp.result_type(A.dtype, x.dtype))
    xb = xb.at[:, :nb].set(x.astype(xb.dtype).reshape(b, nb))
    return _bdia_xla(A, xb)[:, :nb].reshape(b * nb)


def _bdia_spmm_kernel(planes_ref, *refs, offsets, b, k, tile, pad_lo,
                      pad_hi):
    # planes_ref: (D·b, b, tile); refs: ([xm,] xc, [xp,] o) — the
    # PREVIOUS / CURRENT / NEXT x tiles (overlapping windows cannot be
    # expressed by one BlockSpec; materializing them in HBM cost ~10 ms
    # of XLA slice/concat per SpMM — assembling in VMEM is free).  The
    # neighbor blocks exist only when the offsets reach that way: a
    # D=1 offset-0 matrix (block-Jacobi inverse) reads ONLY xc — no
    # wasted neighbor DMAs.  o: (1, b, k, tile).  The RHS index k lives
    # in the SUBLANE dim: every FMA is a full-vreg 2-D (k, tile) op with
    # the plane row sublane-broadcast — the DIA kernel's fast pattern.
    # The planes block is read from HBM once per grid step and reused k
    # times from VMEM (that reuse IS the lockstep amortization).
    o_ref = refs[-1]
    xs_refs = refs[:-1]
    idx = 0
    parts = []
    if pad_lo:
        parts.append(xs_refs[idx][0, :, :, tile - pad_lo:])
        idx += 1
    xc_ref = xs_refs[idx]
    idx += 1
    parts.append(xc_ref[0])
    if pad_hi:
        parts.append(xs_refs[idx][0, :, :, : pad_hi])
    xw = (jnp.concatenate(parts, axis=-1) if len(parts) > 1
          else xc_ref[0])                          # (b, k, pad+tile+pad)
    for p in range(b):
        acc = jnp.zeros((k, tile), dtype=planes_ref.dtype)
        for d, off in enumerate(offsets):
            for q in range(b):
                xs = xw[q, :, off + pad_lo: off + pad_lo + tile]
                acc = acc + planes_ref[d * b + q, p][None, :] * xs
        o_ref[0, p] = acc


def bdia_spmm_pallas(A, X: jax.Array, tile: int = 4096,
                     interpret: bool = None) -> jax.Array:
    """Column-layout (n, k) wrapper over ``bdia_spmm_rows`` — ONE pass
    over the block planes serves all k columns.  The boundary
    transposes pay the k-minor layout tax once; solvers that stay in
    lockstep should use the ROW layout throughout
    (linear/krylov.py::cg_solve_multi_rows)."""
    return bdia_spmm_rows(A, X.T, interpret=interpret).T


def bdia_tile_size(A, k: int) -> int:
    """Pallas row tile for the lockstep BDIA SpMM at RHS width ``k``:
    power of two, VMEM-budgeted (planes block + 3 x blocks + output +
    double-buffering + unrolled temporaries)."""
    b = A.b
    D = len(A.offsets)
    vmem_budget = 11 * 1024 * 1024
    per_tile = 4 * (2 * b * (D * b + 2 * k) + D * b * k * b)
    tile_cap = max((vmem_budget // per_tile) // 128 * 128, 128)
    tile = max(128, min(4096, tile_cap, _ceil_to(A.nb_pad, 128)))
    t = 128
    while t * 2 <= tile:
        t *= 2
    return t


def bdia_tiles_eligible(A, k: int) -> bool:
    """True when the kernel-resident tiles layout can carry a lockstep
    solve on this operator (f32 Pallas path, halos fit one tile)."""
    if A.dtype != jnp.float32 or not (1 <= k <= 16):
        return False
    pad = max(max(0, max(A.offsets)), max(0, -min(A.offsets)))
    return pad <= bdia_tile_size(A, k)


def bdia_rows_to_tiles(A, V: jax.Array, tile: int) -> jax.Array:
    """(k, n) planar ROW-layout block -> the kernel-resident
    (n_tiles+2, b, k, tile) layout with zero halo tiles at both ends.
    One transpose, paid once per solve (not per iteration)."""
    b, nb = A.b, A.nb
    k = V.shape[0]
    npad2 = _ceil_to(A.nb_pad, tile)
    n_tiles = npad2 // tile
    Vp = jnp.pad(V.astype(A.dtype).reshape(k, b, nb),
                 ((0, 0), (0, 0), (tile, npad2 - nb + tile)))
    return jnp.transpose(Vp.reshape(k, b, n_tiles + 2, tile), (2, 1, 0, 3))


def bdia_tiles_to_rows(A, X4: jax.Array) -> jax.Array:
    """Inverse of ``bdia_rows_to_tiles``: drop the halo tiles and the
    alignment pad, back to (k, n) planar rows."""
    b, nb = A.b, A.nb
    k = X4.shape[2]
    Y = jnp.transpose(X4[1:-1], (2, 1, 0, 3)).reshape(k, b, -1)
    return Y[:, :, :nb].reshape(k, b * nb)


def bdia_spmm_tiles(A, X4: jax.Array, interpret: bool = None) -> jax.Array:
    """Lockstep BDIA SpMM on KERNEL-RESIDENT operands: X4 and the result
    are both (n_tiles+2, b, k, tile) with zero halo tiles.

    Why a third entry point: the per-call pad/reshape/transpose in
    ``bdia_spmm_rows`` is 7.2 of its 8.1 ms/iteration at k=8, n=2.1M
    (the Pallas kernel itself is ~0.9 ms) — a solver that keeps its
    whole Krylov state in this layout (linear/krylov.py::
    cg_solve_multi_tiles) pays the layout moves once per SOLVE instead
    of twice per iteration.  The only per-call layout cost left is the
    halo re-pad of the output (one tile-granular contiguous copy).
    f32-only; callers gate on ``bdia_tiles_eligible``."""
    b = A.b
    n_tiles = X4.shape[0] - 2
    k = X4.shape[2]
    tile = X4.shape[3]
    offsets = A.offsets
    pad_lo = max(0, -min(offsets))
    pad_hi = max(0, max(offsets))
    if max(pad_lo, pad_hi) > tile:
        # the kernel reads halos from exactly ONE neighbor tile; a wider
        # band would silently slice the wrong window (solve.py gates on
        # bdia_tiles_eligible, but direct callers must be refused too)
        raise ValueError(
            f"block-diagonal offset reach {max(pad_lo, pad_hi)} exceeds "
            f"the tile size {tile}; use bdia_spmm_rows (XLA halos) or a "
            "larger tile")
    D = len(offsets)
    npad2 = n_tiles * tile
    planes = A.planes
    if planes.shape[-1] != npad2:
        # loop-invariant for an in-loop A: XLA hoists it out of while
        planes = jnp.pad(planes,
                         ((0, 0), (0, 0), (0, npad2 - planes.shape[-1])))
    if interpret is None:
        interpret = _interpret_mode()
    in_specs = [pl.BlockSpec((D * b, b, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)]
    operands = [planes]
    if pad_lo:
        in_specs.append(pl.BlockSpec((1, b, k, tile),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(X4)
    in_specs.append(pl.BlockSpec((1, b, k, tile),
                                 lambda i: (i + 1, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(X4)
    if pad_hi:
        in_specs.append(pl.BlockSpec((1, b, k, tile),
                                     lambda i: (i + 2, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(X4)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_bdia_spmm_kernel, offsets=offsets, b=b,
                              k=k, tile=tile, pad_lo=pad_lo,
                              pad_hi=pad_hi),
            grid=(n_tiles,),
            interpret=interpret,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, b, k, tile), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, b, k, tile), A.dtype),
        )(*operands)
    return jnp.pad(out, ((1, 1), (0, 0), (0, 0), (0, 0)))


def bdia_spmm_rows(A, V: jax.Array, interpret: bool = None) -> jax.Array:
    """Lockstep planar block-DIA SpMM in ROW layout: V is (k, n) with
    one RHS per ROW.  Returns (k, n).

    Why rows: XLA's TPU tiling pads the MINOR dim to 128, so a column
    block (n, k<=16) is physically 128/k times larger than its data —
    every axpy/dot in a column-layout lockstep solver moves 16x the
    bytes at k=8 (and the k=1 "baseline" 128x!).  With k on the
    second-minor axis the padding is 8-row granular, i.e. free at k=8.
    """
    b, nb = A.b, A.nb
    nb_pad = A.nb_pad
    k = V.shape[0]
    offsets = A.offsets
    pad_lo = max(0, -min(offsets))
    pad_hi = max(0, max(offsets))

    tile = bdia_tile_size(A, k)
    npad2 = _ceil_to(nb_pad, tile)
    if A.dtype != jnp.float32 or max(pad_lo, pad_hi) > tile:
        # XLA shift-and-FMA fallback: the Pallas kernel is f32-only
        # (f64 solves — x64 test runs, hi-precision oracles — land here).
        # Scatter the zero-pad BEFORE the k-minor transpose: on the axon
        # TPU backend the fused transpose->dynamic_update_slice->
        # dynamic_slice chain with an f64 k-minor operand MISCOMPILES
        # (probe-isolated: identical graph, wrong values; scatter-then-
        # transpose compiles correctly and is the same data movement).
        dt = jnp.result_type(A.dtype, V.dtype)
        xb0 = jnp.zeros((k, b, A.nb_pad), dtype=dt).at[:, :, :nb].set(
            V.astype(dt).reshape(k, b, nb))
        y = _bdia_xla(A, xb0.transpose(1, 2, 0))[:, :nb, :]   # (b, nb, k)
        return y.transpose(2, 0, 1).reshape(k, b * nb)

    # (k, n) -> (n_tiles+2, b, k, tile): free reshapes + ONE transpose
    # whose trailing dim stays `tile` (tile-granular block moves — the
    # k-minor intermediates of the column layout cost ~10 ms here)
    X4 = bdia_rows_to_tiles(A, V, tile)
    out = bdia_spmm_tiles(A, X4, interpret=interpret)
    # (n_tiles+2, b, k, tile) -> (k, b·nb)
    Y = jnp.transpose(out[1:-1], (2, 1, 0, 3)).reshape(k, b, npad2)
    return Y[:, :, :nb].reshape(k, b * nb)


def bdia_spmm(A, X: jax.Array) -> jax.Array:
    """Blocked multi-RHS planar block-DIA SpMM: (n, k) -> (n, k), one
    pass over the block streams for all k columns (planar-ordered).
    f32 on TPU rides the Pallas lockstep kernel; other dtypes/backends
    use the XLA shift-and-FMA."""
    b, nb = A.b, A.nb
    k = X.shape[1]
    if (A.dtype == jnp.float32 and X.dtype == jnp.float32
            and 1 <= k <= 16 and not _interpret_mode()):
        return bdia_spmm_pallas(A, X)
    xb = jnp.zeros((b, A.nb_pad, k),
                   dtype=jnp.result_type(A.dtype, X.dtype))
    xb = xb.at[:, :nb, :].set(X.astype(xb.dtype).reshape(b, nb, k))
    return _bdia_xla(A, xb)[:, :nb, :].reshape(b * nb, k)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def matvec(A, x: jax.Array) -> jax.Array:
    """y = A @ x for any device sparse format (jittable).

    BwsMatrix operates in its packed ordering (identity when built with
    use_rcm=False, as AMG hierarchies do).
    """
    from ..sparse.bws import BwsMatrix
    if isinstance(A, BwsMatrix):
        from .bws_spmv import bws_spmv
        return bws_spmv(A, x)
    from ..sparse.bdia import BdiaMatrix
    if isinstance(A, BdiaMatrix):
        return bdia_spmv(A, x)
    from ..sparse.device import DiaTiled
    if isinstance(A, DiaTiled):
        if A.dtype == jnp.float32 and x.dtype == jnp.float32:
            return dia_spmv_pallas(A, x)
        return dia_spmv_xla(A.to_dia(), x)
    from .grid_spmv import GridDiaMatrix, grid_dia_spmv
    if isinstance(A, GridDiaMatrix):
        return grid_dia_spmv(A, x)
    if isinstance(A, DiaMatrix):
        if A.dtype == jnp.float32 and x.dtype == jnp.float32:
            return dia_spmv_pallas(A, x)
        return dia_spmv_xla(A, x)
    if isinstance(A, EllMatrix):
        # Unstructured fast path is the BWS kernel (ops/bws_spmv.py); ELL is
        # the XLA-gather fallback and the distributed all-gather format.
        return ell_spmv_xla(A, x)
    if isinstance(A, (jax.Array, np.ndarray)):
        # dense operators here are AMG coarse levels / inverses — small,
        # and their products feed preconditioner consistency, so force
        # exact accumulation (TPU default matmul precision is bf16,
        # measured ~4e-3 relative noise — enough to break PCG)
        return jnp.matmul(A, x, precision=jax.lax.Precision.HIGHEST)
    if hasattr(A, "ndim") and A.ndim == 2:
        return A @ x         # duck-typed operator (linear/operator.py)
    raise TypeError(f"unknown matrix type {type(A)}")


# ---------------------------------------------------------------------------
# SpMM: sparse @ dense multi-vector (block Krylov / multiple RHS)
# ---------------------------------------------------------------------------

def ell_spmm_xla(A: EllMatrix, X: jax.Array) -> jax.Array:
    """Y = A @ X for dense X (n_cols, k_rhs); XLA gather over rows."""
    n = A.n_rows
    Xp = jnp.zeros((max(A.n_cols_pad, A.n_cols + 1), X.shape[1]),
                   dtype=X.dtype)
    Xp = Xp.at[: A.n_cols].set(X[: A.n_cols])
    g = jnp.take(Xp, A.cols, axis=0)             # (n_pad, k, k_rhs)
    # exact accumulation: SpMM feeds AMG construction products (Galerkin,
    # prolongator smoothing) where bf16 noise breaks PCG consistency
    return jnp.einsum("nk,nkr->nr", A.data, g,
                      precision=jax.lax.Precision.HIGHEST)[:n]


def dia_spmm(A: DiaMatrix, X: jax.Array) -> jax.Array:
    """Y = A @ X for banded A: shift-and-fma over the whole (n, k) RHS
    block.  One pass streams the matrix ONCE for all k columns (the
    vmapped-SpMV form it replaces re-read the diagonals per column —
    measured amortization 1.0x on TPU; this form is where the blocked
    multi-RHS win actually comes from).  XLA fuses the D shifted
    row-slices of X into one stencil loop."""
    n = A.n_rows
    n_cols = A.shape[1]
    n_pad = A.diags.shape[1]
    pad_lo = max(0, -min(A.offsets))
    # pad against X's row count (= n_cols), NOT n_rows — same rectangular
    # -operator clamping hazard as dia_spmv_xla
    pad_hi = max(0, max(0, max(A.offsets)) + n_pad - n_cols)
    k = X.shape[1]
    Xp = jnp.concatenate([
        jnp.zeros((pad_lo, k), X.dtype), X.astype(A.dtype),
        jnp.zeros((pad_hi, k), A.dtype)], axis=0)
    acc = jnp.zeros((n_pad, k), dtype=jnp.result_type(A.dtype, X.dtype))
    for d, off in enumerate(A.offsets):
        acc = acc + A.diags[d][:, None] * jax.lax.dynamic_slice(
            Xp, (off + pad_lo, 0), (n_pad, k))
    return acc[:n]


def matmat(A, X: jax.Array) -> jax.Array:
    """Y = A @ X (multi-vector SpMM dispatch, jittable)."""
    from ..sparse.bdia import BdiaMatrix
    if isinstance(A, BdiaMatrix):
        return bdia_spmm(A, X)
    from ..sparse.device import DiaTiled
    if isinstance(A, DiaTiled):
        A = A.to_dia()                 # SpMM reads the 2-D layout
    if isinstance(A, DiaMatrix):
        return dia_spmm(A, X)
    if isinstance(A, EllMatrix):
        return ell_spmm_xla(A, X)
    if isinstance(A, (jax.Array, np.ndarray)):
        return jnp.matmul(A, X, precision=jax.lax.Precision.HIGHEST)
    return A @ X             # duck-typed operator
