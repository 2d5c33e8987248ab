"""Top-level solve() convenience API tests."""
import numpy as np
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.problems import dh_test_problem, fd_laplacian_2d
from pysolvers_tpu.sparse import HostCSR


class TestSolveAuto:
    def test_small_goes_direct(self):
        H, x_exact, b = dh_test_problem(8)   # n=145 <= 500
        st = pst.solve(H, b)
        assert st.success and st.iters == 1
        np.testing.assert_allclose(np.asarray(st.soln), x_exact, atol=1e-7)

    def test_spd_goes_cg(self):
        H = fd_laplacian_2d(26)              # n=676 symmetric
        x = np.random.default_rng(0).random(676)
        st = pst.solve(H, H.matvec(x), tau=1e-10)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x, atol=1e-6)

    def test_nonsymmetric_goes_gmres(self):
        H = fd_laplacian_2d(26)
        rows, cols, vals = H.to_coo()
        vals = vals + np.where(cols == rows + 1, 100.0, 0.0)
        Hn = HostCSR.from_coo(rows, cols, vals, H.shape,
                              sum_duplicates=False)
        x = np.random.default_rng(1).random(676)
        st = pst.solve(Hn, Hn.matvec(x), tau=1e-10, maxiter=700)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x, atol=1e-5)

    def test_explicit_choices(self):
        H = fd_laplacian_2d(24)
        x = np.random.default_rng(2).random(576)
        b = H.matvec(x)
        for m, p in (("cg", "jacobi"), ("cg", "none"), ("gmres", "ilut")):
            st = pst.solve(H, b, method=m, precond=p, tau=1e-9,
                           maxiter=1500)
            assert st.success, (m, p)

    def test_dense_input(self):
        rng = np.random.default_rng(3)
        A = rng.random((30, 30)) + 30 * np.eye(30)
        x = rng.random(30)
        st = pst.solve(A, A @ x)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x, atol=1e-8)


class TestSolveMultiRHS:
    """solve(A, B) with B of shape (n, k): blocked CG for SPD native
    precision, shared-setup column loop otherwise."""

    def _spd(self, k=3, m=26):
        H = fd_laplacian_2d(m)
        n = H.shape[0]
        X = np.random.default_rng(5).random((n, k))
        B = np.stack([H.matvec(X[:, j]) for j in range(k)], axis=1)
        return H, X, B

    @pytest.mark.parametrize("precond", ["jacobi", "ic", "amg"])
    def test_spd_blocked_cg(self, precond):
        H, X, B = self._spd()
        st = pst.solve(H, B, tau=1e-10, precond=precond)
        assert st.success
        assert np.asarray(st.soln).shape == B.shape
        np.testing.assert_allclose(np.asarray(st.soln), X, atol=1e-6)
        for j in range(B.shape[1]):
            rn = np.linalg.norm(B[:, j]
                                - H.matvec(np.asarray(st.soln[:, j])))
            assert rn <= 1e-10 * np.linalg.norm(B[:, j]) * 1.01

    def test_multi_rhs_direct(self):
        H, x_exact, b = dh_test_problem(8)       # n=145 -> direct route
        B = np.stack([b, 2.0 * b], axis=1)
        st = pst.solve(H, B)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln[:, 1]),
                                   2.0 * x_exact, atol=1e-6)

    def test_multi_rhs_gmres(self):
        H = fd_laplacian_2d(26)
        rows, cols, vals = H.to_coo()
        vals = vals + np.where(cols == rows + 1, 100.0, 0.0)
        Hn = HostCSR.from_coo(rows, cols, vals, H.shape,
                              sum_duplicates=False)
        X = np.random.default_rng(6).random((676, 2))
        B = np.stack([Hn.matvec(X[:, j]) for j in range(2)], axis=1)
        st = pst.solve(Hn, B, tau=1e-10, maxiter=700)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), X, atol=1e-5)

    def test_multi_rhs_mixed(self):
        H, X, B = self._spd(k=2, m=40)
        st = pst.solve(H, B, tau=1e-10, precision="mixed")
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), X, atol=1e-6)


class TestMixedPrecision:
    def test_mixed_cg_unstructured(self):
        from pysolvers_tpu.problems import dh_test_problem
        H, x_exact, b = dh_test_problem(12)
        st = pst.solve(H, b, tau=1e-10, precision="mixed")
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x_exact, atol=1e-5)

    def test_mixed_banded_dia(self):
        H = fd_laplacian_2d(40)
        x = np.random.default_rng(5).random(1600)
        st = pst.solve(H, H.matvec(x), tau=1e-10, precision="mixed",
                       precond="jacobi", maxiter=2000)
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x, atol=1e-7)

    def test_mixed_gmres(self):
        from pysolvers_tpu.problems import dh_test_problem
        H, x_exact, b = dh_test_problem(11)
        st = pst.solve(H, b, tau=1e-10, precision="mixed", method="gmres")
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x_exact, atol=1e-5)

    def test_mixed_amg(self):
        from pysolvers_tpu.problems import dh_test_problem
        H, x_exact, b = dh_test_problem(12)
        st = pst.solve(H, b, tau=1e-10, precision="mixed", precond="amg")
        assert st.success
        np.testing.assert_allclose(np.asarray(st.soln), x_exact, atol=1e-5)

    def test_bad_precision_rejected(self):
        from pysolvers_tpu.problems import dh_test_problem
        H, _, b = dh_test_problem(10)
        with pytest.raises(ValueError, match="precision"):
            pst.solve(H, b, precision="mxied")


class TestFrontEndGuards:
    def test_unknown_precond_raises(self):
        import pytest
        from pysolvers_tpu.problems import dh_test_problem
        from pysolvers_tpu.solve import solve
        H, _, b = dh_test_problem(6)
        with pytest.raises(ValueError, match="unknown precond"):
            solve(H, b, method="cg", precond="ichol")

    def test_mixed_cache_not_stale_after_value_update(self):
        """Mutating A.data in place and re-solving must NOT serve the old
        packed operator: the answer has to solve the CURRENT system."""
        import numpy as np
        from pysolvers_tpu.problems import dh_test_problem
        from pysolvers_tpu.solve import solve
        H, x_exact, b = dh_test_problem(8)
        st1 = solve(H, b, tau=1e-10, method="cg", precond="none",
                    precision="mixed", maxiter=4000)
        assert st1.success
        H.data *= 2.0            # same structure/object, new values
        st2 = solve(H, H.matvec(x_exact), tau=1e-10, method="cg",
                    precond="none", precision="mixed", maxiter=4000)
        assert st2.success
        err = np.linalg.norm(np.asarray(st2.soln) - x_exact)
        assert err <= 1e-6
        H.data *= 0.5            # restore for other tests

    def test_mixed_rejects_non_2norm(self):
        import pytest
        from pysolvers_tpu.api import CommonSolverArgs, PCG
        from pysolvers_tpu.problems import dh_test_problem
        H, _, b = dh_test_problem(6)
        s = PCG(CommonSolverArgs(norm="inf"),
                precision="mixed").make_solver()
        with pytest.raises(ValueError, match="2-norm"):
            s.solve(H, b)


class TestLeftPreconditioner:
    def test_pcg_left_ilut_is_applied(self):
        """A left-side preconditioner must accelerate PCG (it used to be
        silently dropped, running unpreconditioned)."""
        from pysolvers_tpu.api import CommonSolverArgs, PCG
        from pysolvers_tpu.linear.ilu import ICPreconditionerType
        from pysolvers_tpu.problems import dh_test_problem
        H, x_exact, b = dh_test_problem(10)
        ctl = CommonSolverArgs(maxiter=800, tau=1e-10)
        st_plain = PCG(ctl).make_solver().solve(H, b)
        st_left = PCG(ctl, precond=ICPreconditionerType(side="left")) \
            .make_solver().solve(H, b)
        assert st_left.success
        assert st_left.iters < st_plain.iters * 0.5
        import numpy as np
        assert np.linalg.norm(np.asarray(st_left.soln) - x_exact) <= 1e-6

    def test_gmres_generic_equals_right_side(self):
        """A generic (side='both') preconditioner is ONE apply usable on
        either side; GMRES must right-precondition with it once per
        iteration — identical to the explicit right-side variant (it used
        to apply it on BOTH sides: double cost, different system)."""
        from pysolvers_tpu.api import CommonSolverArgs, GMRES
        from pysolvers_tpu.linear.preconditioner import \
            JacobiPreconditionerType
        from pysolvers_tpu.problems import dh_test_problem
        H, _, b = dh_test_problem(9)
        ctl = CommonSolverArgs(maxiter=400, tau=1e-10)
        st_b = GMRES(ctl, precond=JacobiPreconditionerType(side="both")) \
            .make_solver().solve(H, b)
        st_r = GMRES(ctl, precond=JacobiPreconditionerType(side="right")) \
            .make_solver().solve(H, b)
        assert st_b.success and st_r.success
        assert st_b.iters == st_r.iters
