"""One-call convenience front end: ``pysolvers_tpu.solve(A, b)``.

Picks a sensible method and preconditioner from the matrix's structure —
the "just solve it" entry point layered over the factory API (which remains
the full-control surface).  Heuristics:

* symmetric (within tolerance) → PCG, else GMRES;
* small systems (n <= 500) → direct dense solve;
* preconditioner "auto": AMG for large SPD systems, IC(t) for medium SPD,
  ILUT for nonsymmetric, none for tiny systems.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .api import CommonSolverArgs, DefaultDirect, GMRES, PCG
from .core import SolveStatus
from .linear.amg import AMGPreconditionerType
from .linear.ilu import ICPreconditionerType, ILUTPreconditionerType
from .sparse.host import HostCSR


def _is_symmetric(A: HostCSR, rtol: float = 1e-10) -> bool:
    At = A.transpose()
    if A.nnz != At.nnz:
        return False
    if not (np.array_equal(A.indptr, At.indptr)
            and np.array_equal(A.indices, At.indices)):
        return False
    denom = np.abs(A.data).max() if A.nnz else 1.0
    return float(np.abs(A.data - At.data).max()) <= rtol * max(denom, 1e-300)


def solve(A, b, *, tau: float = 1e-8, maxiter: int = 1000,
          method: str = "auto", precond: str = "auto",
          **solver_kwargs) -> SolveStatus:
    """Solve A x = b.  Returns a SolveStatus.

    ``method``: "auto" | "cg" | "gmres" | "direct".
    ``precond``: "auto" | "none" | "ic" | "ilut" | "amg" | "jacobi".
    Extra kwargs are forwarded to the solver factory.
    """
    if isinstance(A, np.ndarray) and A.ndim == 2:
        A = HostCSR.from_dense(A)
    if not isinstance(A, HostCSR):
        raise TypeError("solve() takes a HostCSR or dense ndarray; use the "
                        "factory API for device formats / operators")
    n = A.shape[0]
    b = np.asarray(b)

    sym = _is_symmetric(A)
    if method == "auto":
        if n <= 500:
            method = "direct"
        else:
            method = "cg" if sym else "gmres"

    if method == "direct":
        return DefaultDirect().make_solver().solve(A, b)

    if precond == "auto":
        if method == "cg":
            precond = "amg" if n >= 20_000 else "ic"
        else:
            precond = "ilut"
    prec_type = {
        "none": None,
        "ic": ICPreconditionerType(),
        "ilut": ILUTPreconditionerType(),
        "amg": AMGPreconditionerType(num_iters=2, num_levels=2),
        "jacobi": None,
    }.get(precond, None)
    if precond == "jacobi":
        from .linear.preconditioner import JacobiPreconditionerType
        prec_type = JacobiPreconditionerType()

    control = CommonSolverArgs(maxiter=maxiter, tau=tau)
    if method == "cg":
        factory = PCG(control, precond=prec_type)
    elif method == "gmres":
        factory = GMRES(control, precond=prec_type, **{
            k: v for k, v in solver_kwargs.items()
            if k in ("restart", "flexible", "orthog")})
    else:
        raise ValueError(f"unknown method {method!r}")
    return factory.make_solver().solve(A, b)
