"""Newton solver tests: scalar globalization + Bratu PDE (SURVEY §4b)."""
import numpy as np

import jax.numpy as jnp

from pysolvers_tpu import (CommonSolverArgs, DefaultDirect, NewtonSolver,
                           FuncAdapter1D, PCG, SimpleBacktrack,
                           TrivialLinesearch, SolverConfig)
from pysolvers_tpu.linear.amg import AMG
from pysolvers_tpu.problems import Bratu2D


class TestScalarNewton:
    def test_sqrt2(self):
        # reference examples/NewtonExample_Root2.py: f = x^2 - 2
        func = FuncAdapter1D(lambda x: x * x - 2.0, lambda x: 2.0 * x)
        ns = NewtonSolver(SolverConfig(maxiter=20, tau=1e-12))
        st = ns.solve(func, jnp.asarray([1.0]))
        assert st.success
        np.testing.assert_allclose(float(st.soln[0]), np.sqrt(2.0),
                                   rtol=1e-10)

    def test_arctan_needs_linesearch(self):
        # reference examples/NewtonExample_ArcTan.py: full Newton diverges
        # from x0=2 without globalization
        func = FuncAdapter1D(np.arctan, lambda x: 1.0 / (1.0 + x * x))
        ns_full = NewtonSolver(SolverConfig(maxiter=20, tau=1e-12),
                               linesearch=TrivialLinesearch())
        st_full = ns_full.solve(func, jnp.asarray([2.0]))
        assert not st_full.success or abs(float(st_full.soln[0])) > 1e-6

        ns = NewtonSolver(SolverConfig(maxiter=50, tau=1e-12),
                          linesearch=SimpleBacktrack())
        st = ns.solve(func, jnp.asarray([2.0]))
        assert st.success
        np.testing.assert_allclose(float(st.soln[0]), 0.0, atol=1e-10)


class TestBratu:
    def test_bratu_newton_pcg_amg(self):
        # reference examples/FDBratu2D.py:36-48 config, scaled down
        prob = Bratu2D(m=20, alpha=0.5, fmt="dia")
        inner = PCG(CommonSolverArgs(maxiter=400, tau=1e-12),
                    precond=AMG(num_iters=5, num_levels=2))
        ns = NewtonSolver(SolverConfig(maxiter=30, tau=1e-12), solver=inner,
                          min_lin_tol=1e-6, freeze_prec=True)
        st = ns.solve(prob, jnp.zeros(prob.n, dtype=jnp.float64))
        assert st.success
        # verify: F(x*) ~ 0
        Fn = float(jnp.linalg.norm(prob.evalF(st.soln)))
        assert Fn <= 1e-10

    def test_bratu_ell_jacobian_matches_dia(self):
        pd = Bratu2D(m=6, fmt="dia")
        pe = Bratu2D(m=6, fmt="ell")
        u = jnp.asarray(np.random.default_rng(0).random(36))
        np.testing.assert_allclose(np.asarray(pd.evalF(u)),
                                   np.asarray(pe.evalF(u)), rtol=1e-12)
        from pysolvers_tpu.ops import matvec
        v = jnp.asarray(np.random.default_rng(1).random(36))
        Jd_host, Jd = pd.evalJ(u)
        Je_host, Je = pe.evalJ(u)
        np.testing.assert_allclose(np.asarray(matvec(Jd, v)),
                                   np.asarray(matvec(Je, v)), rtol=1e-12)
        # host twin agrees with device Jacobian
        np.testing.assert_allclose(Jd_host.matvec(np.asarray(v)),
                                   np.asarray(matvec(Jd, v)), rtol=1e-12)

    def test_freeze_prec_reuses_preconditioner(self):
        prob = Bratu2D(m=10, fmt="dia")
        inner_type = PCG(CommonSolverArgs(maxiter=200, tau=1e-10))
        ns = NewtonSolver(SolverConfig(maxiter=20, tau=1e-10),
                          solver=inner_type, freeze_prec=True)
        st = ns.solve(prob, jnp.zeros(prob.n, dtype=jnp.float64))
        assert st.success
