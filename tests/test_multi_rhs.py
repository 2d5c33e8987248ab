"""Blocked multi-RHS GMRES + mesh composition (VERDICT r2 item 7).

gmres_solve_multi: lockstep Arnoldi over k RHS, one SpMM operator pass
per step, per-column Givens/convergence/freezing.  Pins column-by-column
agreement with single-RHS solves to 1e-10, solve(A, B) routing for
nonsymmetric systems, and the factory mesh= multi-RHS path (lockstep
solvers over the row-sharded operator, distributed SpMV vmapped over
columns).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.linear.krylov import (gmres_solve, gmres_solve_multi,
                                         cg_solve_multi)
from pysolvers_tpu.ops import matmat, matvec
from pysolvers_tpu.problems import fd_convection_diffusion_2d
from pysolvers_tpu.sparse.device import EllMatrix


def _nonsym(m=16, k=4):
    A = fd_convection_diffusion_2d(m, 12.0, 4.0)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    X = rng.random((n, k))
    B = np.stack([A.matvec(X[:, j]) for j in range(k)], axis=1)
    return A, X, B


class TestGMRESMulti:
    def test_matches_column_by_column_1e10(self):
        A, X, B = _nonsym()
        Ad = EllMatrix.from_host_csr(A, dtype=np.float64)
        Xm, st, _ = gmres_solve_multi(lambda V: matmat(Ad, V),
                                      jnp.asarray(B), maxiter=300,
                                      tau=1e-12)
        assert (np.asarray(st.reason) == 1).all()
        for j in range(B.shape[1]):
            xj, stj, _ = gmres_solve(lambda v: matvec(Ad, v),
                                     jnp.asarray(B[:, j]), maxiter=300,
                                     tau=1e-12)
            np.testing.assert_allclose(np.asarray(Xm[:, j]),
                                       np.asarray(xj),
                                       rtol=1e-10, atol=1e-10)
        assert np.abs(np.asarray(Xm) - X).max() < 1e-8

    def test_mixed_convergence_speeds_freeze(self):
        # column 0 converges at init (b = 0, trivial-b shortcut) and must
        # stay frozen — exactly zero — while column 1 runs 70+ lockstep
        # steps whose junk basis slots must not leak into it
        A, X, B = _nonsym(k=2)
        n = A.shape[0]
        B2 = np.stack([np.zeros(n), B[:, 1]], axis=1)
        Ad = EllMatrix.from_host_csr(A, dtype=np.float64)
        Xm, st, _ = gmres_solve_multi(lambda V: matmat(Ad, V),
                                      jnp.asarray(B2), maxiter=300,
                                      tau=1e-12)
        ks = np.asarray(st.k)
        assert (np.asarray(st.reason) == 1).all()
        assert ks[0] == 0 and ks[1] > 10
        assert np.abs(np.asarray(Xm[:, 0])).max() == 0.0
        assert np.abs(np.asarray(Xm[:, 1]) - X[:, 1]).max() < 1e-8

    def test_solve_api_routes_gmres_multi(self):
        A, X, B = _nonsym()
        st = pst.solve(A, B, tau=1e-11, maxiter=300, method="gmres",
                       precision="native")
        assert st.success
        assert np.abs(np.asarray(st.soln) - X).max() < 1e-7


class TestMeshMulti:
    def _mesh(self):
        from pysolvers_tpu.parallel.mesh import ROW_AXIS
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()), (ROW_AXIS,))

    def test_factory_pcg_mesh_multi(self):
        assert len(jax.devices()) >= 8
        m = 24
        A = pst.problems.fd_laplacian_2d(m, dtype=np.float64)
        n = A.shape[0]
        rng = np.random.default_rng(1)
        X = rng.random((n, 3))
        B = np.stack([A.matvec(X[:, j]) for j in range(3)], axis=1)
        from pysolvers_tpu import PCG, CommonSolverArgs
        s = PCG(CommonSolverArgs(maxiter=2000, tau=1e-11),
                mesh=self._mesh()).make_solver()
        st = s.solve(A, B)
        assert st.success
        assert st.soln.shape == (n, 3)
        assert np.abs(np.asarray(st.soln) - X).max() < 1e-6

    def test_factory_gmres_mesh_multi(self):
        assert len(jax.devices()) >= 8
        A, X, B = _nonsym(m=20, k=3)
        from pysolvers_tpu import GMRES, CommonSolverArgs
        s = GMRES(CommonSolverArgs(maxiter=400, tau=1e-11),
                  mesh=self._mesh()).make_solver()
        st = s.solve(A, B)
        assert st.success
        assert np.abs(np.asarray(st.soln) - X).max() < 1e-6

    def test_cg_multi_under_mesh_matches_single_device(self):
        assert len(jax.devices()) >= 8
        from pysolvers_tpu.parallel import shard_dia, dist_dia_spmv
        from pysolvers_tpu.parallel.mesh import ROW_AXIS
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self._mesh()
        m = 24
        A = pst.problems.fd_laplacian_2d(m, dtype=np.float64)
        n = A.shape[0]
        rng = np.random.default_rng(2)
        X = rng.random((n, 3))
        B = np.stack([A.matvec(X[:, j]) for j in range(3)], axis=1)
        A_sh = shard_dia(A, mesh)
        Bp = np.zeros((A_sh.n_pad, 3))
        Bp[:n] = B
        Bd = jax.device_put(jnp.asarray(Bp),
                            NamedSharding(mesh, P(ROW_AXIS, None)))
        mvm = jax.vmap(lambda v: dist_dia_spmv(A_sh, v),
                       in_axes=1, out_axes=1)
        Xm, st, _ = jax.jit(lambda Bd: cg_solve_multi(
            mvm, Bd, maxiter=2000, tau=1e-12))(Bd)
        assert (np.asarray(st.reason) == 1).all()
        assert np.abs(np.asarray(Xm)[:n] - X).max() < 1e-8


class TestMultiRhsGuards:
    def test_solve_gmres_multi_honors_restart_via_column_loop(self):
        # restart/orthog requests must not be silently dropped by the
        # lockstep route (review finding)
        A, X, B = _nonsym(m=12, k=2)
        st = pst.solve(A, B, tau=1e-10, maxiter=400, method="gmres",
                       precision="native", restart=30)
        assert st.success
        assert np.abs(np.asarray(st.soln) - X).max() < 1e-6

    def test_mesh_multi_solves_in_operator_dtype(self):
        # an f64 numpy B must not promote the sharded lockstep solve
        import jax
        from jax.sharding import Mesh
        from pysolvers_tpu.parallel.mesh import ROW_AXIS
        mesh = Mesh(np.array(jax.devices()), (ROW_AXIS,))
        m = 16
        A = pst.problems.fd_laplacian_2d(m, dtype=np.float32)
        n = A.shape[0]
        rng = np.random.default_rng(3)
        Xe = rng.random((n, 2)).astype(np.float32)
        B = np.stack([A.matvec(Xe[:, j]) for j in range(2)],
                     axis=1).astype(np.float64)
        from pysolvers_tpu import PCG, CommonSolverArgs
        s = PCG(CommonSolverArgs(maxiter=2000, tau=1e-5),
                mesh=mesh).make_solver()
        st = s.solve(A, B)
        assert st.success
        assert np.asarray(st.soln).dtype == np.float32

    def test_gmres_mesh_multi_restart_column_loop(self):
        import jax
        from jax.sharding import Mesh
        from pysolvers_tpu.parallel.mesh import ROW_AXIS
        mesh = Mesh(np.array(jax.devices()), (ROW_AXIS,))
        A, X, B = _nonsym(m=14, k=2)
        from pysolvers_tpu import GMRES, CommonSolverArgs
        s = GMRES(CommonSolverArgs(maxiter=400, tau=1e-10),
                  restart=40, mesh=mesh).make_solver()
        st = s.solve(A, B)
        assert st.success
        assert np.abs(np.asarray(st.soln) - X).max() < 1e-6


class TestGMRESMultiRestart:
    """Lockstep restarted multi-RHS GMRES (VERDICT r3 item 6): restart>0
    stays blocked (no column loop), pinned to column-by-column restarted
    results at 1e-10."""

    def test_restarted_matches_column_by_column(self):
        A, X, B = _nonsym(m=16, k=3)
        Ad = EllMatrix.from_host_csr(A, dtype=np.float64)
        Xm, st, _ = gmres_solve_multi(lambda V: matmat(Ad, V),
                                      jnp.asarray(B), maxiter=600,
                                      tau=1e-12, restart=25)
        assert (np.asarray(st.reason) == 1).all()
        for j in range(B.shape[1]):
            xj, stj, _ = gmres_solve(lambda v: matvec(Ad, v),
                                     jnp.asarray(B[:, j]), maxiter=600,
                                     tau=1e-12, restart=25)
            np.testing.assert_allclose(np.asarray(Xm[:, j]),
                                       np.asarray(xj), rtol=1e-8,
                                       atol=1e-10)
        assert np.abs(np.asarray(Xm) - X).max() < 1e-8

    def test_restarted_true_residual_verified(self):
        # cycle boundaries verify B - A X; the final resid is TRUE
        A, X, B = _nonsym(m=14, k=2)
        Ad = EllMatrix.from_host_csr(A, dtype=np.float64)
        Xm, st, _ = gmres_solve_multi(lambda V: matmat(Ad, V),
                                      jnp.asarray(B), maxiter=400,
                                      tau=1e-11, restart=20)
        R = B - np.stack([A.matvec(np.asarray(Xm[:, j], dtype=np.float64))
                          for j in range(2)], axis=1)
        rn = np.sqrt((R ** 2).sum(axis=0))
        np.testing.assert_allclose(rn, np.asarray(st.resid), rtol=1e-6,
                                   atol=1e-13)
        assert (rn <= 1e-11 * np.sqrt((B ** 2).sum(axis=0)) * 1.01).all()

    def test_restarted_preconditioned(self):
        from pysolvers_tpu.linear.ilu import ILUTPreconditionerType
        A, X, B = _nonsym(m=16, k=2)
        from pysolvers_tpu.sparse.host import HostCSR
        prec = ILUTPreconditionerType().form(A)
        papply = jax.vmap(prec.apply_any, in_axes=1, out_axes=1)
        Ad = EllMatrix.from_host_csr(A, dtype=np.float64)
        Xm, st, _ = gmres_solve_multi(lambda V: matmat(Ad, V),
                                      jnp.asarray(B), maxiter=200,
                                      tau=1e-12, restart=15,
                                      precond=papply)
        assert (np.asarray(st.reason) == 1).all()
        assert np.abs(np.asarray(Xm) - X).max() < 1e-8

    def test_solve_front_end_lockstep_restart(self):
        # solve(A, B, restart=...) now rides the lockstep path
        A, X, B = _nonsym(m=12, k=2)
        st = pst.solve(A, B, tau=1e-10, maxiter=400, method="gmres",
                       precision="native", restart=30)
        assert st.success
        assert np.abs(np.asarray(st.soln) - X).max() < 1e-6

    def test_mixed_convergence_speeds_freeze(self):
        # one easy column (b = A e1 scaled tiny) converges cycles before
        # a hard one; its solution must stay pinned while the hard column
        # keeps restarting
        A, _, _ = _nonsym(m=14, k=2)
        n = A.shape[0]
        rng = np.random.default_rng(8)
        x_easy = np.zeros(n); x_easy[0] = 1.0
        x_hard = rng.random(n)
        B = np.stack([A.matvec(x_easy), A.matvec(x_hard)], axis=1)
        Ad = EllMatrix.from_host_csr(A, dtype=np.float64)
        Xm, st, _ = gmres_solve_multi(lambda V: matmat(Ad, V),
                                      jnp.asarray(B), maxiter=500,
                                      tau=1e-12, restart=12)
        assert (np.asarray(st.reason) == 1).all()
        # columns converge at their own cycle counts; each must stay
        # pinned to its own solution (freeze correctness — the per-column
        # agreement tests above pin the mechanism at 1e-10)
        assert np.abs(np.asarray(Xm[:, 0]) - x_easy).max() < 1e-8
        assert np.abs(np.asarray(Xm[:, 1]) - x_hard).max() < 1e-8
