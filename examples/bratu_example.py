#!/usr/bin/env python
"""Bratu 2D: inexact Newton + PCG + AMG (parity with reference
examples/FDBratu2D.py:33-54 driver: m=100, tau=1e-12, AMG numIters=5,
minLinTol=1e-6, freezePrec)."""
import argparse

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import pysolvers_tpu as pst
from pysolvers_tpu.problems import Bratu2D


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--tau", type=float, default=1e-12)
    from pysolvers_tpu.utils.platform import (add_platform_arg,
                                               enable_persistent_cache,
                                               ensure_platform)
    add_platform_arg(ap)
    args = ap.parse_args()
    ensure_platform(args.platform)
    enable_persistent_cache()

    prob = Bratu2D(m=args.m, alpha=args.alpha)
    inner = pst.PCG(pst.CommonSolverArgs(maxiter=500, tau=1e-12),
                    precond=pst.AMG(num_iters=5, num_levels=2))
    ns = pst.NewtonSolver(pst.SolverConfig(maxiter=30, tau=args.tau),
                          solver=inner, min_lin_tol=1e-6, freeze_prec=True)
    st = ns.solve(prob, jnp.zeros(prob.n, dtype=jnp.float64))
    print(st)
    print(f"||F(x*)|| = {float(jnp.linalg.norm(prob.evalF(st.soln))):.3e}")
    return 0 if st.success else 1


if __name__ == "__main__":
    raise SystemExit(main())
