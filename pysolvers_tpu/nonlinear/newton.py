"""Inexact Newton driver with adaptive linear tolerance and preconditioner
reuse.

Capability parity with reference PySolvers/Nonlinear/Newton.py:10-101:
* convergence test ||F|| <= r0·tau + tau (Newton.py:54)
* adaptive linear tolerance tau_lin = max(tolFudge·||F||/r0, minLinTol),
  or fixed tau_lin for testing (Newton.py:62-73)
* Newton step J·p = −F via a LinearSolverType factory (Newton.py:21,77)
* line-search globalization (Newton.py:89-93)
* preconditioner freeze across Newton iterations (Newton.py:39 +
  PreconditionerFreeze.py:10-21) — implemented here as a context manager
  whose cleanup actually runs (the reference's ``__def__`` typo meant its
  auto-unfreeze never fired; SURVEY §7.3 lists this as a bug not to copy).

The outer Newton loop is host control flow (few, expensive trips); every
F/J evaluation and inner solve runs on device.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core import SolverConfig, SolveStatus, StopReason
from ..api import LinearSolverType, IterativeLinearSolver, DefaultDirect
from .linesearch import LineSearchBase, SimpleBacktrack


class PreconditionerFreeze:
    """Freeze a solver's preconditioner for a scope (reference
    PreconditionerFreeze.py:3-24, with working cleanup)."""

    def __init__(self, solver, enable: bool = True):
        self.solver = solver
        self.enable = enable and isinstance(solver, IterativeLinearSolver)

    def __enter__(self):
        if self.enable:
            self.solver.freeze_prec()
        return self

    def __exit__(self, *exc):
        if self.enable:
            self.solver.unfreeze_prec()
        return False


class NewtonSolver:
    def __init__(self, control: Optional[SolverConfig] = None,
                 solver: Optional[LinearSolverType] = None,
                 linesearch: Optional[LineSearchBase] = None,
                 fix_lin_tol: bool = False, tol_fudge: float = 0.1,
                 min_lin_tol: float = 1e-10, freeze_prec: bool = False):
        self.control = control or SolverConfig(maxiter=20, tau=1e-10)
        self.solver_type = solver or DefaultDirect()
        self.linesearch = linesearch or SimpleBacktrack()
        self.fix_lin_tol = fix_lin_tol
        self.tol_fudge = tol_fudge
        self.min_lin_tol = min_lin_tol
        self.freeze_prec = freeze_prec

    def solve(self, func, x_init) -> SolveStatus:
        """func exposes evalF(x) and evalJ(x) (reference Newton.py:35,59).

        A plain numpy ``x_init`` keeps the iterate in NUMPY arithmetic at
        its own dtype — pass ``np.longdouble`` zeros to run the outer
        loop in extended precision.  Near tight tolerances the limiting
        error is the f64 QUANTIZATION of x itself (a final Newton step of
        ~1e-15 on O(1) values rounds into ||J||·ulp residual noise ~1e-11
        — measured on Bratu m=100 at the reference's tau=1e-12);
        80-bit iterates push that floor down ~2000x.
        """
        norm_fn = self.control.norm_fn()
        tau = self.control.tau
        use_np = isinstance(x_init, np.ndarray) and \
            not isinstance(x_init, jnp.ndarray)
        x = x_init if use_np else jnp.asarray(x_init)
        solver = self.solver_type.make_solver()
        history = []

        F = func.evalF(x)
        norm_f = float(norm_fn(F))
        r0 = norm_f
        history.append(norm_f)

        with PreconditionerFreeze(solver, self.freeze_prec):
            for it in range(self.control.maxiter):
                if norm_f <= r0 * tau + tau:
                    return SolveStatus(
                        success=True, soln=x, resid=norm_f, iters=it,
                        reason=StopReason.CONVERGED,
                        resid_history=np.asarray(history))
                J = func.evalJ(x)
                if isinstance(solver, IterativeLinearSolver):
                    if self.fix_lin_tol:
                        tau_lin = self.tol_fudge
                    else:
                        tau_lin = max(self.tol_fudge * norm_f / r0,
                                      self.min_lin_tol) if r0 > 0 else \
                            self.min_lin_tol
                    solver.set_tolerance(min(tau_lin, 0.5))
                status = solver.solve(J, -F)
                if not status.success:
                    return SolveStatus(
                        success=False, soln=x, resid=norm_f, iters=it,
                        reason=StopReason.INNER_SOLVE_FAIL,
                        msg=f"inner linear solve failed: {status.msg}",
                        resid_history=np.asarray(history))
                p = status.soln
                if use_np:
                    # keep the update in numpy at x's dtype (mixing a jax
                    # array in would silently downcast longdouble to f64;
                    # a hard-coded f64 would silently PROMOTE f32)
                    p = np.asarray(p, dtype=x.dtype)
                x, F, norm_f, ok = self.linesearch.search(
                    x, norm_f, p, func, norm_fn)
                history.append(norm_f)
                if not ok:
                    return SolveStatus(
                        success=False, soln=x, resid=norm_f, iters=it + 1,
                        reason=StopReason.LINESEARCH_FAIL,
                        msg="line search failed to find sufficient decrease",
                        resid_history=np.asarray(history))

        if norm_f <= r0 * tau + tau:
            return SolveStatus(success=True, soln=x, resid=norm_f,
                               iters=self.control.maxiter,
                               reason=StopReason.CONVERGED,
                               resid_history=np.asarray(history))
        return SolveStatus(
            success=not self.control.fail_on_maxiter, soln=x, resid=norm_f,
            iters=self.control.maxiter, reason=StopReason.MAXITER,
            msg="Newton reached maxiter", resid_history=np.asarray(history))


class FuncAdapter1D:
    """Adapt scalar f, f' to the vector evalF/evalJ protocol (reference
    Nonlinear/FuncAdapter1D.py:4-24)."""

    def __init__(self, f, df):
        self.f = f
        self.df = df

    def evalF(self, x):
        return jnp.asarray([self.f(float(x[0]))], dtype=jnp.result_type(x))

    def evalJ(self, x):
        return jnp.asarray([[self.df(float(x[0]))]],
                           dtype=jnp.result_type(x))
