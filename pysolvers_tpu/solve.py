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
          precision: str = "native", **solver_kwargs) -> SolveStatus:
    """Solve A x = b.  Returns a SolveStatus.

    ``method``: "auto" | "cg" | "gmres" | "direct".
    ``precond``: "auto" | "none" | "ic" | "ilut" | "amg" | "jacobi".
    ``precision``: "native" solves in the matrix dtype; "mixed" runs the
    inner Krylov in f32 on the device kernels with f64 residual
    refinement on host — the TPU route to 1e-10 accuracy (f64 device
    arithmetic is XLA-emulated there).
    Extra kwargs are forwarded to the solver factory.
    """
    if isinstance(A, np.ndarray) and A.ndim == 2:
        A = HostCSR.from_dense(A)
    if not isinstance(A, HostCSR):
        raise TypeError("solve() takes a HostCSR or dense ndarray; use the "
                        "factory API for device formats / operators")
    n = A.shape[0]
    b = np.asarray(b)

    if precision not in ("native", "mixed"):
        raise ValueError(f"precision must be 'native' or 'mixed', "
                         f"got {precision!r}")
    sym = _is_symmetric(A)
    if method == "auto":
        if n <= 500:
            method = "direct"
        else:
            method = "cg" if sym else "gmres"

    if method == "direct":
        return DefaultDirect().make_solver().solve(A, b)

    if precision == "mixed":
        return _solve_mixed(A, b, tau=tau, maxiter=maxiter, method=method,
                            precond=precond,
                            restart=solver_kwargs.get("restart"))

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


# --- mixed-precision route -------------------------------------------------
# per-matrix packed state: BWS/DIA f32 operator + formed preconditioner +
# STABLE callables (refine._cached_inner keys its jit on their identity —
# fresh lambdas per call would re-trace the Pallas-heavy graph each solve)
_MIXED_CACHE: dict = {}


def _mixed_state(A: HostCSR, method: str, precond: str, restart):
    key = (id(A), method, precond, restart)
    ent = _MIXED_CACHE.get(key)
    if ent is not None and ent["A"] is A:
        return ent

    from .ops import matvec as _matvec
    from .sparse.device import DiaMatrix

    if DiaMatrix.is_profitable(A):
        dev = DiaMatrix.from_host_csr(A, dtype=np.float32)
        perm = None
        Hp = A
        mv_lo = lambda v: _matvec(dev, v)
    else:
        from .sparse.bws import BwsMatrix
        from .ops.bws_spmv import bws_spmv
        from .ops.fuse import fused_build
        # host_pack keeps the permutation host-side (a device fetch of
        # dev.perm/iperm intermittently stalls on remote tunnels)
        item, assemble, perm = BwsMatrix.host_pack(A, dtype=np.float32)
        (out,) = fused_build([item])
        dev = assemble(out)
        perm = np.asarray(perm)
        Hp = A.permute_symmetric(perm)
        mv_lo = lambda v: bws_spmv(dev, v)

    if precond == "auto":
        precond = "ic" if method == "cg" else "ilut"
    Hp32 = HostCSR(Hp.indptr, Hp.indices, Hp.data.astype(np.float32),
                   Hp.shape)
    M = None
    prec_fn = None
    if precond == "ic":
        M = ICPreconditionerType().form(Hp32)
    elif precond == "ilut":
        M = ILUTPreconditionerType().form(Hp32)
    elif precond == "jacobi":
        from .linear.preconditioner import JacobiPreconditionerType
        M = JacobiPreconditionerType().form(Hp32)
    elif precond == "amg":
        # hierarchy built on the (permuted) system so the inner matvec
        # and the preconditioner agree on the ordering
        from .linear.amg import build_sa_hierarchy, build_device_hierarchy
        from .linear.amg import v_cycle
        import jax.numpy as jnp
        mlh = build_sa_hierarchy(Hp, num_levels=2)
        # BWS-format levels/transfers on TPU backends (Pallas matvecs);
        # gather formats elsewhere
        import jax
        fmt = ("bws" if jax.default_backend() in ("tpu", "axon")
               else "auto")
        hier = build_device_hierarchy(mlh, smoother="jacobi", nu_pre=2,
                                      nu_post=2, dtype=np.float32,
                                      matrix_format=fmt)

        def prec_fn(r):
            x = jnp.zeros_like(r)
            for _ in range(2):
                x = v_cycle(hier, r, x)
            return x
    if M is not None:
        prec_fn = lambda v: M.apply_right(v)
    mv_hi = lambda v: Hp.matvec(v)

    iperm_h = None
    if perm is not None:
        iperm_h = np.empty(len(perm), dtype=np.int64)
        iperm_h[perm] = np.arange(len(perm))
    ent = dict(A=A, dev=dev, perm=perm, iperm_h=iperm_h, mv_lo=mv_lo,
               mv_hi=mv_hi, prec=prec_fn, M=M)
    if len(_MIXED_CACHE) > 8:
        _MIXED_CACHE.pop(next(iter(_MIXED_CACHE)))
    _MIXED_CACHE[key] = ent
    return ent


def _solve_mixed(A: HostCSR, b, *, tau, maxiter, method, precond,
                 restart=None) -> SolveStatus:
    from .core import make_status, SolverConfig
    from .linear.refine import ir_solve_host

    st8 = _mixed_state(A, method, precond, restart)
    perm = st8["perm"]
    bp = (b if perm is None else b[perm]).astype(np.float64)
    if method == "gmres" and restart is None:
        restart = 60
    x, st, _ = ir_solve_host(st8["mv_hi"], st8["mv_lo"], bp, tau=tau,
                             inner_tau=1e-6, inner_maxiter=maxiter,
                             method=method, restart=restart,
                             precond_lo=st8["prec"], host_residual=True)
    xh = np.asarray(x)
    if perm is not None:
        xh = xh[st8["iperm_h"]]
    control = SolverConfig(maxiter=maxiter, tau=tau)
    return make_status(xh, st, control)
