"""API-shell tests: factory surface, freeze semantics, left/right
preconditioning, direct solver, iteration reporting."""
import numpy as np
import pytest

import jax.numpy as jnp

import pysolvers_tpu as pst
from pysolvers_tpu.problems import dh_test_problem, fd_laplacian_2d


class TestFactorySurface:
    def test_pcg_factory_roundtrip(self):
        H, x_exact, b = dh_test_problem(9)
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=400, tau=1e-10),
                         precond=pst.RightIC()).make_solver()
        st = solver.solve(H, b)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x_exact, atol=1e-6)
        # camelCase aliases work (reference spelling)
        solver2 = pst.PCG(pst.CommonSolverArgs()).makeSolver()
        assert solver2.matrixFrozen() is False

    def test_gmres_left_ilut(self):
        H, x_exact, b = dh_test_problem(9)
        solver = pst.GMRES(pst.CommonSolverArgs(maxiter=400, tau=1e-10),
                           precond=pst.LeftILUT(1e-3, 15)).make_solver()
        st = solver.solve(H, b)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x_exact, atol=1e-6)
        # true residual of the ORIGINAL system is reported
        r = np.linalg.norm(H.matvec(np.asarray(st.soln)) - b)
        assert abs(st.resid - r) / max(r, 1e-30) < 1e-3

    def test_gmres_right_ilut(self):
        H, x_exact, b = dh_test_problem(9)
        solver = pst.GMRES(pst.CommonSolverArgs(maxiter=400, tau=1e-10),
                           precond=pst.RightILUT(1e-3, 15)).make_solver()
        st = solver.solve(H, b)
        assert st.success

    def test_prec_freeze_reuse(self):
        H, _, b = dh_test_problem(8)
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=400, tau=1e-10),
                         precond=pst.RightIC()).make_solver()
        st1 = solver.solve(H, b)
        solver.freeze_prec()
        formed = solver._formed_prec
        st2 = solver.solve(H, 2.0 * b)
        assert solver._formed_prec is formed
        solver.unfreeze_prec()
        solver.solve(H, b)
        assert solver._formed_prec is not formed
        assert st1.success and st2.success

    def test_set_tolerance_override(self):
        H, _, b = dh_test_problem(8)
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=400, tau=1e-2)
                         ).make_solver()
        solver.set_tolerance(1e-10)
        st = solver.solve(H, b)
        assert st.success
        r = np.linalg.norm(H.matvec(np.asarray(st.soln)) - b)
        assert r <= 1e-10 * np.linalg.norm(b)

    def test_show_iters_prints(self, capsys):
        H, _, b = dh_test_problem(7)
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=300, tau=1e-8,
                                              showIters=True, interval=5)
                         ).make_solver()
        solver.solve(H, b)
        out = capsys.readouterr().out
        assert "PCG iter=" in out


class TestDirect:
    def test_direct_dense(self):
        rng = np.random.default_rng(0)
        A = rng.random((20, 20)) + 20 * np.eye(20)
        x = rng.random(20)
        st = pst.DefaultDirect().make_solver().solve(A, A @ x)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x, atol=1e-8)

    def test_direct_sparse(self):
        H, x_exact, b = dh_test_problem(8)
        st = pst.DefaultDirect().make_solver().solve(H, b)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x_exact, atol=1e-7)

    def test_direct_failure_wrapped(self):
        # singular matrix → failed status, no exception
        A = np.zeros((4, 4))
        st = pst.DefaultDirect().make_solver().solve(A, np.ones(4))
        assert not st.success


class TestMaxiterSemantics:
    def test_fail_on_maxiter_true(self):
        H, _, b = dh_test_problem(9)
        st = pst.PCG(pst.CommonSolverArgs(maxiter=2, tau=1e-14)
                     ).make_solver().solve(H, b)
        assert not st.success

    def test_fail_on_maxiter_false(self):
        # maxiter counts as success (preconditioner-mode semantics,
        # reference IterativeSolver.py:127-129)
        H, _, b = dh_test_problem(9)
        st = pst.PCG(pst.CommonSolverArgs(maxiter=2, tau=1e-14,
                                          failOnMaxiter=False)
                     ).make_solver().solve(H, b)
        assert st.success
