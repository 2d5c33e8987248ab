"""Operator algebra + standalone Arnoldi/Givens tests (SURVEY §4c
property tests: Givens norm preservation, Arnoldi orthogonality)."""
import numpy as np

import jax.numpy as jnp

from pysolvers_tpu.linear.arnoldi import (arnoldi, arnoldi_residual,
                                          apply_givens, givens_coefficients)
from pysolvers_tpu.linear.operator import LinearOperator
from pysolvers_tpu.ops import matvec
from pysolvers_tpu.problems import fd_laplacian_1d, fd_laplacian_2d
from pysolvers_tpu.sparse import DiaMatrix, EllMatrix


class TestGivens:
    def test_zeroes_target_and_preserves_norm(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            v = jnp.asarray(rng.standard_normal(6))
            c, s = givens_coefficients(v[2], v[5])
            w = apply_givens(v, c, s, 2, 5)
            assert abs(float(w[5])) < 1e-12
            np.testing.assert_allclose(float(jnp.linalg.norm(w)),
                                       float(jnp.linalg.norm(v)), rtol=1e-12)

    def test_zero_pair(self):
        c, s = givens_coefficients(jnp.asarray(0.0), jnp.asarray(0.0))
        assert float(c) == 1.0 and float(s) == 0.0


class TestArnoldi:
    def _run(self, method):
        H = fd_laplacian_1d(50)
        A = DiaMatrix.from_host_csr(H)
        q0 = jnp.asarray(np.random.default_rng(1).random(50))
        Q, Hh = arnoldi(lambda v: matvec(A, v), q0, m=20, method=method)
        fact, orth = arnoldi_residual(lambda v: matvec(A, v), Q, Hh)
        # reference self-test bounds (ArnoldiGS.py:98-133): small residuals
        assert float(fact) < 1e-8
        assert float(orth) < 1e-8

    def test_mgs(self):
        self._run("mgs")

    def test_cgs(self):
        self._run("cgs")


class TestLinearOperator:
    def test_algebra(self):
        H = fd_laplacian_2d(6)
        A = LinearOperator.from_matrix(EllMatrix.from_host_csr(H))
        I = LinearOperator.identity(36)
        v = jnp.asarray(np.random.default_rng(2).random(36))
        Av = H.matvec(np.asarray(v))
        np.testing.assert_allclose(np.asarray((A + I)(v)), Av + np.asarray(v),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray((A - 2.0 * I)(v)),
                                   Av - 2 * np.asarray(v), rtol=1e-12)
        np.testing.assert_allclose(np.asarray((A @ A)(v)),
                                   H.matvec(Av), rtol=1e-12)
        np.testing.assert_allclose(np.asarray((-A)(v)), -Av, rtol=1e-12)

    def test_inverse_default(self):
        H = fd_laplacian_2d(5)
        A = LinearOperator.from_matrix(EllMatrix.from_host_csr(H))
        v = jnp.asarray(np.random.default_rng(3).random(25))
        x = A.inverse()(v)
        np.testing.assert_allclose(H.matvec(np.asarray(x)), np.asarray(v),
                                   atol=1e-8)

    def test_inverse_with_solver_type(self):
        from pysolvers_tpu import PCG, CommonSolverArgs
        H = fd_laplacian_2d(5)
        A = LinearOperator.from_matrix(DiaMatrix.from_host_csr(H))
        inv = A.inverse(PCG(CommonSolverArgs(maxiter=200, tau=1e-12)))
        v = jnp.asarray(np.random.default_rng(4).random(25))
        x = inv(v)
        np.testing.assert_allclose(H.matvec(np.asarray(x)), np.asarray(v),
                                   atol=1e-8)
