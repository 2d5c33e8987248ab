"""Mixed-precision iterative refinement.

TPU arithmetic is fastest in f32 (f64 is emulated), but the reference's
acceptance bar is 1e-10 relative residuals (BASELINE.md).  The classical
answer is iterative refinement: inner Krylov solves run in f32 on the fast
kernels; an outer loop accumulates the solution and recomputes the true
residual in f64.  Converges to f64-level residuals as long as the inner
solve reduces the error by a fixed factor (inner_tau ≈ 1e-6 per pass).

Fully jitted: outer ``lax.while_loop`` over inner ``cg_solve``/``gmres_solve``
calls — one compiled computation end to end.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import StopReason
from .krylov import KrylovState, cg_solve, gmres_solve


class _IRCarry(NamedTuple):
    k: jax.Array
    x: jax.Array          # f64 accumulated solution
    resid: jax.Array
    inner_total: jax.Array
    reason: jax.Array


def ir_solve(matvec_hi: Callable, matvec_lo: Callable, b: jax.Array,
             *, tau: float = 1e-10, max_outer: int = 20,
             inner_tau: float = 1e-6, inner_maxiter: int = 500,
             method: str = "cg", precond_lo: Optional[Callable] = None,
             restart: Optional[int] = None):
    """Solve A x = b to f64 tolerance with f32 inner solves.

    matvec_hi: f64 SpMV (true residuals); matvec_lo: f32 SpMV (inner).
    Returns (x_f64, KrylovState, resid_history) like the Krylov drivers.
    """
    b = b.astype(jnp.float64)
    norm = lambda v: jnp.sqrt(jnp.sum(v * v))
    b_norm = norm(b)
    tol = tau * b_norm

    def inner(r32):
        if method == "cg":
            d, st, _ = cg_solve(matvec_lo, r32, maxiter=inner_maxiter,
                                tau=inner_tau, precond=precond_lo)
        else:
            d, st, _ = gmres_solve(matvec_lo, r32, maxiter=inner_maxiter,
                                   tau=inner_tau, precond=precond_lo,
                                   restart=restart,
                                   check_true_residual=False)
        return d, st

    history0 = jnp.full((max_outer + 1,), jnp.nan, dtype=jnp.float64)

    def cond(c: _IRCarry):
        return c.reason == StopReason.RUNNING

    def body(c: _IRCarry):
        r = b - matvec_hi(c.x)
        rn = norm(r)
        # scale the correction problem to O(1) so f32 dynamic range is safe
        scale = jnp.where(rn > 0, rn, 1.0)
        d32, st = inner((r / scale).astype(jnp.float32))
        x = c.x + scale * d32.astype(jnp.float64)
        r_new = b - matvec_hi(x)
        rn_new = norm(r_new)
        k = c.k + 1
        stalled = rn_new >= rn * 0.5
        reason = jnp.where(
            rn_new <= tol, StopReason.CONVERGED,
            jnp.where(k >= max_outer, StopReason.MAXITER,
                      jnp.where(stalled, StopReason.BREAKDOWN,
                                StopReason.RUNNING))).astype(jnp.int32)
        return _IRCarry(k, x, rn_new, c.inner_total + st.k, reason)

    x0 = jnp.zeros_like(b)
    r0 = norm(b)
    init_reason = jnp.where(r0 <= tol, StopReason.CONVERGED,
                            StopReason.RUNNING).astype(jnp.int32)
    init = _IRCarry(jnp.int32(0), x0, r0, jnp.int32(0), init_reason)
    final = jax.lax.while_loop(cond, body, init)
    return final.x, KrylovState(final.inner_total, final.resid, final.reason), None


def ir_solve_host(matvec_hi, matvec_lo, b, *, tau: float = 1e-10,
                  max_outer: int = 20, inner_tau: float = 1e-6,
                  inner_maxiter: int = 500, method: str = "cg",
                  precond_lo=None, restart=None):
    """Host-driven iterative refinement: the inner f32 Krylov solve is one
    (small) jitted computation re-dispatched per outer pass, and the f64
    residual update runs as a second jitted step.

    Rationale: the fully-jitted ``ir_solve`` nests while_loops three deep,
    which some remote TPU compilers refuse; this variant keeps each
    compiled graph small at the cost of ~max_outer dispatches (micro-
    seconds to milliseconds — negligible against the solve).  Semantics
    match ``ir_solve``.
    """
    import numpy as np
    from ..core import StopReason

    b = b.astype(jnp.float64)
    norm = lambda v: jnp.sqrt(jnp.sum(v * v))
    b_norm = float(norm(b))
    tol = tau * b_norm

    @jax.jit
    def residual(x):
        r = b - matvec_hi(x)
        return r, norm(r)

    @jax.jit
    def inner(r32):
        if method == "cg":
            return cg_solve(matvec_lo, r32, maxiter=inner_maxiter,
                            tau=inner_tau, precond=precond_lo)
        return gmres_solve(matvec_lo, r32, maxiter=inner_maxiter,
                           tau=inner_tau, precond=precond_lo,
                           restart=restart, check_true_residual=False)

    x = jnp.zeros_like(b)
    inner_total = 0
    rn_prev = float("inf")
    reason = StopReason.MAXITER
    k = 0
    for k in range(1, max_outer + 1):
        r, rn = residual(x)
        rn = float(rn)
        if rn <= tol:
            reason = StopReason.CONVERGED
            k -= 1
            break
        if rn >= rn_prev * 0.5:
            reason = StopReason.BREAKDOWN
            break
        rn_prev = rn
        scale = rn if rn > 0 else 1.0
        d32, st, _ = inner((r / scale).astype(jnp.float32))
        inner_total += int(st.k)
        x = x + scale * d32.astype(jnp.float64)
    else:
        _, rn = residual(x)
        rn = float(rn)
        if rn <= tol:
            reason = StopReason.CONVERGED

    _, rn_final = residual(x)
    return x, KrylovState(jnp.int32(inner_total),
                          jnp.float64(float(rn_final)),
                          jnp.int32(int(reason))), None
