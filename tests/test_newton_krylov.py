"""Fully-jitted matrix-free Newton-Krylov tests."""
import numpy as np

import jax
import jax.numpy as jnp

from pysolvers_tpu.core import StopReason
from pysolvers_tpu.nonlinear.newton_krylov import newton_krylov_solve
from pysolvers_tpu.problems import Bratu2D


class TestNewtonKrylov:
    def test_bratu_jvp_newton(self):
        prob = Bratu2D(m=16, fmt="dia")
        x, st = newton_krylov_solve(prob.eval_f,
                                    jnp.zeros(prob.n, dtype=jnp.float64),
                                    tau=1e-12, maxiter=30,
                                    inner_maxiter=300, method="cg",
                                    min_lin_tol=1e-8)
        assert int(st.reason) == StopReason.CONVERGED
        Fn = float(jnp.linalg.norm(prob.eval_f(x)))
        assert Fn <= 1e-10
        assert int(st.inner_total) > 0   # total-Krylov counting works

    def test_scalar_system(self):
        def F(x):
            return jnp.array([x[0] ** 2 - 2.0])

        x, st = newton_krylov_solve(F, jnp.asarray([1.0]), tau=1e-13,
                                    inner_maxiter=5, method="gmres")
        assert int(st.reason) == StopReason.CONVERGED
        np.testing.assert_allclose(float(x[0]), np.sqrt(2.0), rtol=1e-10)

    def test_whole_solve_jits(self):
        prob = Bratu2D(m=8, fmt="dia")

        @jax.jit
        def run(x0):
            return newton_krylov_solve(prob.eval_f, x0, tau=1e-10,
                                       inner_maxiter=150, method="cg",
                                       min_lin_tol=1e-8)

        x, st = run(jnp.zeros(prob.n, dtype=jnp.float64))
        assert int(st.reason) == StopReason.CONVERGED
