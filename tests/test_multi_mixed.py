"""Mixed precision × lockstep multi-RHS composition (VERDICT r4 item 2):
solve(A, B, precision="mixed") must run blocked — no column loop — at
tau=1e-10, each column pinned to the single-RHS mixed route's semantics."""
import numpy as np
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu import solve
from pysolvers_tpu.core import StopReason


def _problem(m=48, k=5):
    H = pst.problems.fd_laplacian_2d(m, dtype=np.float64)
    rng = np.random.default_rng(0)
    X_true = rng.random((H.shape[0], k))
    B = np.stack([H.matvec(X_true[:, j]) for j in range(k)], axis=1)
    return H, X_true, B


class TestHostCSRMixedMulti:
    def test_blocked_no_column_loop(self, monkeypatch):
        """The mixed multi route must NOT fall into the per-column
        loop."""
        import sys
        mod = sys.modules["pysolvers_tpu.solve"]
        H, X_true, B = _problem()

        def boom(*a, **kw):
            raise AssertionError("column loop used for mixed multi-RHS")

        monkeypatch.setattr(mod, "_solve_multi_column_loop", boom)
        st = solve(H, B, tau=1e-10, maxiter=2000, precond="ic",
                   precision="mixed")
        assert st.success, st
        err = np.abs(np.asarray(st.soln) - X_true).max()
        assert err < 1e-7, err

    def test_per_column_matches_single_rhs_route(self):
        """Each column of the blocked solve reaches the same tolerance
        the single-RHS mixed route certifies (per-column PCG semantics,
        reference PCGSolver.py:109-138)."""
        H, X_true, B = _problem()
        st = solve(H, B, tau=1e-10, maxiter=2000, precond="ic",
                   precision="mixed")
        assert st.success
        b_cols = [np.linalg.norm(B[:, j]) for j in range(B.shape[1])]
        X = np.asarray(st.soln)
        for j in range(B.shape[1]):
            st1 = solve(H, B[:, j], tau=1e-10, maxiter=2000,
                        precond="ic", precision="mixed")
            assert st1.success
            # both certify ||r_j|| <= 1e-10 ||b_j|| on the f64 residual
            r_blk = np.linalg.norm(B[:, j] - H.matvec(X[:, j]))
            r_one = np.linalg.norm(
                B[:, j] - H.matvec(np.asarray(st1.soln)))
            assert r_blk <= 1e-10 * b_cols[j] * 1.01, (j, r_blk)
            assert r_one <= 1e-10 * b_cols[j] * 1.01, (j, r_one)
            # and agree on the solution to refinement accuracy
            dx = np.abs(X[:, j] - np.asarray(st1.soln)).max()
            assert dx < 1e-6 * np.abs(X_true[:, j]).max(), (j, dx)

    def test_unpreconditioned_and_jacobi(self):
        H, X_true, B = _problem(m=24, k=3)
        for prec in ("none", "jacobi"):
            st = solve(H, B, tau=1e-10, maxiter=3000, precond=prec,
                       precision="mixed")
            assert st.success, (prec, st)
            err = np.abs(np.asarray(st.soln) - X_true).max()
            assert err < 1e-6, (prec, err)

    def test_gmres_mixed_multi(self):
        H, X_true, B = _problem(m=24, k=3)
        st = solve(H, B, tau=1e-10, maxiter=800, method="gmres",
                   precond="ilut", precision="mixed")
        assert st.success, st
        err = np.abs(np.asarray(st.soln) - X_true).max()
        assert err < 1e-6, err


class TestBdiaMixedMulti:
    def test_blocked_tiles_route(self):
        from pysolvers_tpu.sparse.bdia import BdiaMatrix
        H = pst.problems.fd_vector_laplacian_2d(20, b=3, coupling=0.2,
                                                dtype=np.float64)
        A = BdiaMatrix.from_host_csr(H, b=3)
        rng = np.random.default_rng(1)
        k = 4
        X_true = rng.random((H.shape[0], k))
        B = np.stack([H.matvec(X_true[:, j]) for j in range(k)], axis=1)
        st = solve(A, B, tau=1e-10, maxiter=3000, precond="bjacobi",
                   precision="mixed")
        assert st.success, st
        X = np.asarray(st.soln)
        err = np.abs(X - X_true).max() / np.abs(X_true).max()
        assert err < 1e-7, err
        for j in range(k):
            rn = np.linalg.norm(B[:, j] - H.matvec(X[:, j]))
            assert rn <= 1.01e-10 * np.linalg.norm(B[:, j]), (j, rn)

    def test_matches_single_rhs_bdia_mixed(self):
        from pysolvers_tpu.sparse.bdia import BdiaMatrix
        H = pst.problems.fd_vector_laplacian_2d(16, b=2, coupling=0.3,
                                                dtype=np.float64)
        A = BdiaMatrix.from_host_csr(H, b=2)
        rng = np.random.default_rng(2)
        x_true = rng.random(H.shape[0])
        b = H.matvec(x_true)
        B = np.stack([b, 2.0 * b], axis=1)
        st = solve(A, B, tau=1e-10, maxiter=3000, precond="bjacobi",
                   precision="mixed")
        st1 = solve(A, b, tau=1e-10, maxiter=3000, precond="bjacobi",
                    precision="mixed")
        assert st.success and st1.success
        dx = np.abs(np.asarray(st.soln)[:, 0]
                    - np.asarray(st1.soln)).max()
        assert dx < 1e-6 * np.abs(x_true).max(), dx
        dx2 = np.abs(np.asarray(st.soln)[:, 1] / 2.0
                     - np.asarray(st1.soln)).max()
        assert dx2 < 1e-6 * np.abs(x_true).max(), dx2
