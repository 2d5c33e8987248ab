#!/usr/bin/env python
"""Newton on f(x) = x^2 - 2 (parity with reference
examples/NewtonExample_Root2.py:6-35)."""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import pysolvers_tpu as pst


def main():
    func = pst.FuncAdapter1D(lambda x: x * x - 2.0, lambda x: 2.0 * x)
    ns = pst.NewtonSolver(pst.SolverConfig(maxiter=20, tau=1e-14))
    st = ns.solve(func, jnp.asarray([1.0]))
    print(st)
    print(f"x = {float(st.soln[0]):.15f}, sqrt(2) = {np.sqrt(2):.15f}")
    return 0 if st.success else 1


if __name__ == "__main__":
    raise SystemExit(main())
