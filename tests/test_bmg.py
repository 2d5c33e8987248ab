"""Strong preconditioning on the BDIA fast lane (VERDICT r4 item 5):
dof-decoupled multigrid ('bmg'), planar-native, zero per-apply
transposes."""
import numpy as np

import pysolvers_tpu as pst
from pysolvers_tpu import solve
from pysolvers_tpu.sparse.bdia import BdiaMatrix


def _vec_problem(m=48, b=3, coupling=0.2, seed=0):
    H = pst.problems.fd_vector_laplacian_2d(m, b=b, coupling=coupling,
                                            dtype=np.float64)
    A = BdiaMatrix.from_host_csr(H, b=b)
    rng = np.random.default_rng(seed)
    x_true = rng.random(H.shape[0])
    return H, A, x_true, H.matvec(x_true)


class TestDofSubsystem:
    def test_extraction_oracle(self):
        from pysolvers_tpu.linear.block_precond import bdia_dof_subsystem
        H, A, _, _ = _vec_problem(m=8, b=3)
        Hd = H.to_dense()
        for p in range(3):
            S = bdia_dof_subsystem(A, p).to_dense()
            np.testing.assert_allclose(S, Hd[p::3, p::3], rtol=0,
                                       atol=0)


class TestBmgSolve:
    def test_mesh_independent_iterations(self):
        """bmg iteration counts must not grow with the grid (the whole
        point of a multigrid preconditioner) and must crush the
        block-Jacobi count."""
        iters = {}
        for m in (24, 48):
            _, A, x_true, b = _vec_problem(m=m)
            st = solve(A, b, tau=1e-10, maxiter=3000, precond="bmg",
                       precision="mixed")
            assert st.success, (m, st)
            err = np.abs(np.asarray(st.soln) - x_true).max() \
                / np.abs(x_true).max()
            assert err < 1e-8, (m, err)
            iters[m] = int(st.iters)
        assert iters[48] <= iters[24] + 10, iters
        assert iters[48] <= 60, iters

    def test_native_f32_path(self):
        _, A, x_true, b = _vec_problem(m=24)
        import jax.numpy as jnp
        A32 = A.astype(jnp.float32)
        st = solve(A32, b.astype(np.float32), tau=1e-5, maxiter=500,
                   precond="bmg")
        assert st.success, st
        err = np.abs(np.asarray(st.soln) - x_true).max() \
            / np.abs(x_true).max()
        assert err < 1e-3, err

    def test_lockstep_multi_mixed_bmg(self):
        """Strong preconditioning composes with the blocked mixed
        multi-RHS route (items 2+5 together)."""
        H, A, _, _ = _vec_problem(m=24)
        rng = np.random.default_rng(3)
        k = 3
        X_true = rng.random((H.shape[0], k))
        B = np.stack([H.matvec(X_true[:, j]) for j in range(k)], axis=1)
        st = solve(A, B, tau=1e-10, maxiter=2000, precond="bmg",
                   precision="mixed")
        assert st.success, st
        X = np.asarray(st.soln)
        for j in range(k):
            rn = np.linalg.norm(B[:, j] - H.matvec(X[:, j]))
            assert rn <= 1.01e-10 * np.linalg.norm(B[:, j]), (j, rn)
        assert int(st.iters) <= 120, int(st.iters)
