#!/usr/bin/env python
"""Newton on f(x) = arctan(x) — line-search globalization test (parity with
reference examples/NewtonExample_ArcTan.py:6-36)."""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import pysolvers_tpu as pst


def main():
    func = pst.FuncAdapter1D(np.arctan, lambda x: 1.0 / (1.0 + x * x))
    ns = pst.NewtonSolver(pst.SolverConfig(maxiter=50, tau=1e-14),
                          linesearch=pst.SimpleBacktrack())
    st = ns.solve(func, jnp.asarray([2.0]))
    print(st)
    print(f"x = {float(st.soln[0]):.3e} (root is 0)")
    return 0 if st.success else 1


if __name__ == "__main__":
    raise SystemExit(main())
