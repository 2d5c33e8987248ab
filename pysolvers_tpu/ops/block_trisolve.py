"""Exact block-banded triangular solve on TPU (dense MXU path).

Replaces the reference's SuperLU triangular-solve delegation
(ICPreconditioner.py:61-63 ``spsolve_triangular``;
ILUTPreconditioner.py:67,78 ``.solve()``) with a TPU-native EXACT solve:

After RCM ordering the incomplete factors are banded (DH-15 IC factor:
bandwidth 257).  Partition rows into contiguous blocks of ``bs``; the factor
becomes block-banded with ``p = max block reach`` subdiagonal blocks.  Then

    x_i = L_ii^{-1} ( b_i - sum_{j=1..p} S_{i,j} x_{i-j} )

is a linear recurrence over blocks with dense ``bs x bs`` operators — one
``lax.scan`` of dense matvecs per solve.  The diagonal-block inverses are
computed ON DEVICE at setup by nilpotent doubling:

    L_ii = D (I + K),  K strictly lower => nilpotent, K^bs = 0
    (I + K)^{-1} = prod_{k=0}^{ceil(log2 bs)-1} (I + (-K)^(2^k))   (exact)

which is a handful of batched MXU matmuls — no SuperLU, no scalar gathers,
no 10s-of-MB host->device uploads (only the sparse ELL ships; the dense
blocks are scattered and inverted on device).

Upper-triangular factors are handled by the reversal trick: with J the
index-reversal permutation, J U J is lower triangular, so solve the
reversed system and flip the result.

Unlike the level-scheduled path (ops/trisolve.py) whose per-level gathers
lower to XLA's scalar path on TPU, and unlike the truncated Jacobi sweeps
(approximate), this path is exact AND maps to the MXU.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.host import HostCSR

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockTriSolvePlan:
    """Device-resident plan.

    s_hat: (nb, bs, p*bs)  Dinv_i @ [S_{i,p} ... S_{i,1}] (oldest block
           first, matching the scan carry layout)
    dinv:  (nb, bs, bs)    dense inverses of the diagonal blocks
    """

    s_hat: jax.Array
    dinv: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    bs: int = dataclasses.field(metadata=dict(static=True))
    p: int = dataclasses.field(metadata=dict(static=True))
    flip: bool = dataclasses.field(metadata=dict(static=True))
    # flip_pad: reversal is by npad-1 (pad to nb*bs FIRST, then reverse)
    # instead of n-1 — used by plans whose wide layout was derived on
    # device by block transposition (build_ic_block_trisolve_plan_pair),
    # where only the npad reversal keeps block boundaries aligned.
    flip_pad: bool = dataclasses.field(default=False,
                                      metadata=dict(static=True))

    @property
    def nb(self):
        return self.s_hat.shape[0]


def _tri_inverse_doubling(D: jax.Array) -> jax.Array:
    """Batched inverse of dense lower-triangular blocks (nb, bs, bs) by
    nilpotent doubling — exact in exact arithmetic, all MXU matmuls."""
    nb, bs, _ = D.shape
    d = jnp.diagonal(D, axis1=1, axis2=2)                    # (nb, bs)
    dinv = 1.0 / d
    # column-normalize: K[i,j] = S[i,j]/d_j  =>  D = (I + K) Ddiag
    tri = jnp.tril(jnp.ones((bs, bs), dtype=D.dtype), k=-1)
    K = D * tri * dinv[:, None, :]
    X = -K                                                   # (-K)^1
    inv = jnp.broadcast_to(jnp.eye(bs, dtype=D.dtype), D.shape) + X
    steps = max(int(math.ceil(math.log2(bs))) - 1, 0)

    # fori_loop, not an unrolled Python loop: identical MXU work, ~4x
    # smaller HLO — the serialized setup executable ships through the
    # tunnel on every process-first load, so program size is latency
    def body(_, c):
        X, inv = c
        X = jnp.einsum("nij,njk->nik", X, X, precision=_HI)  # (-K)^(2^k)
        inv = inv + jnp.einsum("nij,njk->nik", inv, X, precision=_HI)
        return X, inv

    X, inv = jax.lax.fori_loop(0, steps, body, (X, inv))
    # D^{-1} = Ddiag^{-1} (I + K)^{-1}  (row scaling)
    return dinv[:, :, None] * inv


def build_block_trisolve_plan(T: HostCSR, lower: bool, unit_diag: bool = False,
                              bs: int = 256, dtype=np.float32,
                              max_p: int = 4,
                              max_bytes: int = 2 << 30) -> BlockTriSolvePlan:
    """Pack a banded triangular HostCSR into a block-banded device plan.

    Raises ValueError when the factor's block reach exceeds ``max_p`` (not
    banded enough — caller should fall back to another trisolve mode) or
    when the dense block storage would exceed ``max_bytes``.
    """
    n = T.shape[0]
    rows, cols, vals = T.to_coo()
    vals = vals.astype(dtype)
    if not lower:
        rows, cols = (n - 1) - rows, (n - 1) - cols
    flip = not lower

    # element-wise, not block-level: an above-diagonal entry INSIDE a
    # diagonal block passes a block-reach check but would be silently
    # masked by the tril mask in the doubling inverse — wrong solve
    if (cols > rows).any():
        raise ValueError("matrix is not (reversed-)lower triangular")
    nb = max((n + bs - 1) // bs, 1)
    npad = nb * bs
    blk_r = rows // bs
    blk_c = cols // bs
    reach = blk_r - blk_c
    p = int(reach.max(initial=0))
    if p > max_p:
        raise ValueError(f"block reach {p} exceeds max_p={max_p}; "
                         "factor not banded enough for the block path")
    if nb * bs * bs * (2 * p + 2) * np.dtype(dtype).itemsize > max_bytes:
        raise ValueError("dense block storage would exceed max_bytes")

    # wide layout per block row: [S_p | ... | S_1 | D], width (p+1)*bs;
    # column offset of entry (r, c): (p - reach)*bs + c % bs.  Flat
    # scatter indices computed on host; the dense build + inversion runs
    # as ONE jitted dispatch (eager op-by-op costs ~25 ms/op through the
    # axon tunnel, and the doubling matmuls belong on the MXU anyway).
    vals, flat_idx, meta = _prep(rows, cols, vals, n, nb, bs, p)
    from .fuse import DeviceCached, SetupItem, fused_build
    item = SetupItem((vals, DeviceCached(flat_idx)), _single_build,
                     (nb, bs, p, unit_diag, jnp.dtype(dtype).name))
    ((s_hat, dinv),) = fused_build([item])
    return BlockTriSolvePlan(s_hat, dinv, n, bs, p, flip)


def _single_build(arrs, st):
    vals, flat_idx = arrs
    nb, bs, p, unit_diag, dtype_name = st
    return _build_blocks_impl(vals, flat_idx, nb, bs, p, unit_diag,
                              dtype_name)


def _prep(rows, cols, vals, n, nb, bs, p):
    """Host-side scatter-index prep.  Every call site ships the indices
    as int32 (halves the host->device index upload), so refuse loudly
    when the wide array is too large for int32 instead of letting the
    downstream .astype(np.int32) wrap silently."""
    blk_r = rows // bs
    reach = blk_r - cols // bs
    wide = (p + 1) * bs
    if nb * bs * wide >= 2 ** 31:
        raise ValueError(
            f"block plan wide array ({nb * bs * wide} elements) exceeds "
            "int32 scatter-index range; reduce max_bytes/problem size or "
            "use another trisolve mode")
    flat_idx = (blk_r * bs + rows % bs) * wide + (p - reach) * bs \
        + cols % bs
    return vals, flat_idx.astype(np.int32), (nb, bs, p)


def build_block_trisolve_plan_pair(T_lo: HostCSR, T_up: HostCSR,
                                   unit_lo: bool = False,
                                   unit_up: bool = False,
                                   bs: int = 256, dtype=np.float32,
                                   max_p: int = 4,
                                   max_bytes: int = 2 << 30,
                                   defer: bool = False):
    """Build the (lower, upper) plan pair of a factorization in ONE jitted
    dispatch — a preconditioner needs both, and through a remote tunnel
    each separate dispatch costs ~25 ms plus pipeline stalls.  The two
    factors' buffers ship as ONE blob transfer (ops/fuse.py).

    ``defer=True`` returns ``(SetupItem, assemble)`` instead of
    dispatching, so the build can fuse with other setup work (e.g. the
    operator's BWS pack) in a single device round trip.
    """
    preps = []
    for T, lower, unit in ((T_lo, True, unit_lo), (T_up, False, unit_up)):
        n = T.shape[0]
        rows, cols, vals = T.to_coo()
        vals = vals.astype(dtype)
        if not lower:
            rows, cols = (n - 1) - rows, (n - 1) - cols
        if (cols > rows).any():
            raise ValueError("matrix is not (reversed-)lower triangular")
        nb = max((n + bs - 1) // bs, 1)
        blk_r = rows // bs
        reach = blk_r - cols // bs
        p = int(reach.max(initial=0))
        if p > max_p:
            raise ValueError(f"block reach {p} exceeds max_p={max_p}")
        if nb * bs * bs * (2 * p + 2) * np.dtype(dtype).itemsize > max_bytes:
            raise ValueError("dense block storage would exceed max_bytes")
        v, fi, _ = _prep(rows, cols, vals, n, nb, bs, p)
        preps.append((v, fi, n, nb, p, unit, not lower))

    dtype_name = jnp.dtype(dtype).name
    (v1, i1, n1, nb1, p1, u1, f1), (v2, i2, n2, nb2, p2, u2, f2) = preps
    m1 = len(v1)
    v_cat = np.concatenate([v1, v2])
    i_cat = np.concatenate([i1, i2])

    from .fuse import DeviceCached, SetupItem, fused_build
    item = SetupItem((v_cat, DeviceCached(i_cat)), _pair_builder,
                     (m1, nb1, p1, u1, nb2, p2, u2, bs, dtype_name))

    def assemble(out):
        (s1, d1), (s2, d2) = out
        return (BlockTriSolvePlan(s1, d1, n1, bs, p1, f1),
                BlockTriSolvePlan(s2, d2, n2, bs, p2, f2))

    if defer:
        return item, assemble
    (out,) = fused_build([item])
    return assemble(out)


# module-level builders: stable identity keys the fused-setup jit cache
# (a per-call local closure would RETRACE on every ``form()`` — measured
# ~0.8 s per preconditioner build on the remote backend)
def _pair_builder(arrs, st):
    v_cat, i_cat = arrs
    m1, nb1, p1, u1, nb2, p2, u2, bs, dtype_name = st
    return (_build_blocks_impl(v_cat[:m1], i_cat[:m1], nb1, bs, p1, u1,
                               dtype_name),
            _build_blocks_impl(v_cat[m1:], i_cat[m1:], nb2, bs, p2, u2,
                               dtype_name))


def build_ic_block_trisolve_plan_pair(L: HostCSR, bs: int = 256,
                                      dtype=np.float32, max_p: int = 4,
                                      max_bytes: int = 2 << 30,
                                      defer: bool = False):
    """(L, Lᵀ) plan pair for an IC factorization — HALF the upload of the
    generic pair: only L ships; the upper plan's wide layout is derived on
    device by block transposition.

    With L extended to npad=nb·bs by identity tail rows and J the npad
    reversal, (J·Lᵀ_ext·J) block (i, i−k) = J_b·(L_ext block
    (nb−1−i+k, nb−1−i))ᵀ·J_b — a flip/transpose/shift of the reach-k slab
    of L's wide array, all on device.  The derived plan uses the npad
    reversal (``flip_pad=True``): pad b first, then reverse, so block
    boundaries stay aligned when n % bs != 0.
    """
    n = L.shape[0]
    rows, cols, vals = L.to_coo()
    vals = vals.astype(dtype)
    if (cols > rows).any():
        raise ValueError("matrix is not lower triangular")
    nb = max((n + bs - 1) // bs, 1)
    reach = rows // bs - cols // bs
    p = int(reach.max(initial=0))
    if p > max_p:
        raise ValueError(f"block reach {p} exceeds max_p={max_p}")
    if nb * bs * bs * (4 * p + 4) * np.dtype(dtype).itemsize > max_bytes:
        raise ValueError("dense block storage would exceed max_bytes")
    v, fi, _ = _prep(rows, cols, vals, n, nb, bs, p)
    dtype_name = jnp.dtype(dtype).name

    from .fuse import DeviceCached, SetupItem, fused_build
    item = SetupItem((v, DeviceCached(fi)), _ic_pair_builder,
                     (nb, bs, p, dtype_name))

    def assemble(out):
        (s1, d1), (s2, d2) = out
        return (BlockTriSolvePlan(s1, d1, n, bs, p, False),
                BlockTriSolvePlan(s2, d2, n, bs, p, True, flip_pad=True))

    if defer:
        return item, assemble
    (out,) = fused_build([item])
    return assemble(out)


def _ic_pair_builder(arrs, st):
    v, fi = arrs
    nb, bs, p, dtype_name = st
    W = _wide_from_scatter(v, fi, nb, bs, p, dtype_name)
    WU = _transpose_wide(W, nb, bs, p)
    return (_plans_from_wide(W, bs, p, False),
            _plans_from_wide(WU, bs, p, False))


def _transpose_wide(W: jax.Array, nb: int, bs: int, p: int) -> jax.Array:
    """Wide array of (J·Lᵀ_ext·J) from the wide array of L (npad reversal).

    Reach-k slab of the result at block-row i is
    J_b·(reach-k slab of L at block-row nb−1−i+k)ᵀ·J_b — flip the slab
    along the block axis, transpose/flip each block, shift down by k.
    """
    slabs = []
    for k in range(p, -1, -1):                  # output layout [S_p..S_1|D]
        slab = W[:, :, (p - k) * bs:(p - k + 1) * bs]
        g = slab.transpose(0, 2, 1)[::-1, ::-1, ::-1]
        if k:
            g = jnp.concatenate(
                [jnp.zeros((k, bs, bs), dtype=W.dtype), g[:nb - k]], axis=0)
        slabs.append(g)
    return jnp.concatenate(slabs, axis=2)


def _build_blocks_impl(vals, flat_idx, nb, bs, p, unit_diag, dtype_name):
    W = _wide_from_scatter(vals, flat_idx, nb, bs, p, dtype_name)
    return _plans_from_wide(W, bs, p, unit_diag)


def _wide_from_scatter(vals, flat_idx, nb, bs, p, dtype_name):
    dtype = jnp.dtype(dtype_name)
    wide = (p + 1) * bs
    W = jnp.zeros((nb * bs * wide,), dtype=dtype)
    return W.at[flat_idx].set(vals.astype(dtype)).reshape(nb, bs, wide)


def _plans_from_wide(W, bs, p, unit_diag):
    dtype = W.dtype
    nb = W.shape[0]
    D = W[:, :, p * bs:]
    eye = jnp.eye(bs, dtype=dtype)
    if unit_diag:
        D = D * (1.0 - eye) + eye
    else:
        d = jnp.diagonal(D, axis1=1, axis2=2)
        # padded tail rows (and any structurally-missing diagonal) -> 1.0
        d_ok = jnp.where(d == 0, 1.0, d)
        D = jnp.where(jnp.eye(bs, dtype=bool)[None],
                      d_ok[:, :, None] * eye[None], D)
    dinv = _tri_inverse_doubling(D)
    if p:
        s_hat = jnp.einsum("nij,njk->nik", dinv, W[:, :, : p * bs],
                           precision=_HI)
    else:
        s_hat = jnp.zeros((nb, bs, 0), dtype=dtype)
    return s_hat, dinv


def block_trisolve(plan: BlockTriSolvePlan, b: jax.Array) -> jax.Array:
    """Solve T x = b exactly with the block-banded plan (jittable)."""
    n, bs, p, nb = plan.n, plan.bs, plan.p, plan.nb
    if plan.flip_pad:
        # npad reversal: pad to nb*bs first, then reverse (zeros lead)
        bp = jnp.zeros((nb * bs,), dtype=plan.dinv.dtype).at[:n].set(
            b.astype(plan.dinv.dtype))[::-1]
    else:
        bf = b[::-1] if plan.flip else b
        bp = jnp.zeros((nb * bs,), dtype=plan.dinv.dtype).at[:n].set(
            bf.astype(plan.dinv.dtype))
    u = jnp.einsum("nij,nj->ni", plan.dinv, bp.reshape(nb, bs),
                   precision=_HI)                              # (nb, bs)

    def unpack(xs_flat):
        if plan.flip_pad:
            return xs_flat[::-1][:n]
        x = xs_flat[:n]
        return x[::-1] if plan.flip else x

    if p == 0:
        return unpack(u.reshape(-1)).astype(b.dtype)

    def step(carry, inp):
        u_i, s_i = inp                                         # (bs,), (bs, p*bs)
        x_i = u_i - jnp.einsum("ij,j->i", s_i, carry.reshape(-1),
                               precision=_HI)
        carry = jnp.concatenate([carry[1:], x_i[None]], axis=0)
        return carry, x_i

    carry0 = jnp.zeros((p, bs), dtype=plan.dinv.dtype)
    _, xs = jax.lax.scan(step, carry0, (u, plan.s_hat))
    return unpack(xs.reshape(-1)).astype(b.dtype)
