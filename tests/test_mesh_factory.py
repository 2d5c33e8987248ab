"""mesh= on the PCG/GMRES factories: the one-line distributed solve
(VERDICT r1 item 5).

``PCG(control, precond=BlockJacobiILUPreconditionerType(mesh), mesh=mesh)``
must run the whole preconditioned solve sharded over the mesh and match
the single-device result to the solver tolerance, driven purely through
the factory API.
"""
import numpy as np
import jax
import pytest

from pysolvers_tpu import CommonSolverArgs, GMRES, PCG
from pysolvers_tpu.parallel import (make_mesh,
                                    BlockJacobiILUPreconditionerType)
from pysolvers_tpu.problems import dh_test_problem, fd_laplacian_2d


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


class TestMeshFactory:
    def test_pcg_block_ilu_mesh_matches_single_device(self, mesh):
        H, x_exact, b = dh_test_problem(10)
        control = CommonSolverArgs(maxiter=800, tau=1e-10)
        prec = BlockJacobiILUPreconditionerType(mesh, drop_tol=1e-4,
                                                sweeps=10)
        st_d = PCG(control, precond=prec, mesh=mesh).make_solver() \
            .solve(H, b)
        assert st_d.success
        st_s = PCG(control).make_solver().solve(H, b)
        assert st_s.success
        xd, xs = np.asarray(st_d.soln), np.asarray(st_s.soln)
        assert np.linalg.norm(xd - x_exact) <= 1e-6
        # both converge to the same 1e-10-residual solution
        assert np.linalg.norm(xd - xs) / np.linalg.norm(xs) <= 1e-6
        # preconditioning must actually help on the mesh
        assert st_d.iters < st_s.iters

    def test_gmres_mesh_unpreconditioned(self, mesh):
        H, x_exact, b = dh_test_problem(8)
        control = CommonSolverArgs(maxiter=600, tau=1e-10)
        st = GMRES(control, restart=60, mesh=mesh).make_solver() \
            .solve(H, b)
        assert st.success
        assert np.linalg.norm(np.asarray(st.soln) - x_exact) <= 1e-6

    def test_pcg_mesh_dia_banded(self, mesh):
        H = fd_laplacian_2d(24)
        rng = np.random.default_rng(0)
        x_exact = rng.random(H.shape[0])
        b = H.matvec(x_exact)
        control = CommonSolverArgs(maxiter=4000, tau=1e-10)
        st = PCG(control, mesh=mesh).make_solver().solve(H, b)
        assert st.success
        err = np.linalg.norm(np.asarray(st.soln) - x_exact)
        assert err / np.linalg.norm(x_exact) <= 1e-7

    def test_pcg_mesh_mixed_unpreconditioned(self, mesh):
        """mesh= + precision='mixed': f32 sharded inner solves + host f64
        refinement reach 1e-10 even though the device arithmetic is f32."""
        H, x_exact, b = dh_test_problem(10)
        s = PCG(CommonSolverArgs(maxiter=2000, tau=1e-10),
                precision="mixed", mesh=mesh).make_solver()
        st = s.solve(H, b)
        assert st.success
        rel = np.linalg.norm(np.asarray(st.soln) - x_exact) \
            / np.linalg.norm(x_exact)
        assert rel <= 1e-7
        # the residual reported is the exact host f64 residual
        rn = np.linalg.norm(b - H.matvec(np.asarray(st.soln)))
        assert rn <= 1e-10 * np.linalg.norm(b) * 1.01

    def test_pcg_mesh_mixed_block_ilu(self, mesh):
        H, x_exact, b = dh_test_problem(10)
        prec = BlockJacobiILUPreconditionerType(mesh, drop_tol=1e-4,
                                                sweeps=10)
        st = PCG(CommonSolverArgs(maxiter=2000, tau=1e-10), precond=prec,
                 precision="mixed", mesh=mesh).make_solver().solve(H, b)
        assert st.success
        assert np.linalg.norm(np.asarray(st.soln) - x_exact) <= 1e-6

    def test_solver_reuse_across_matrix_formats(self, mesh):
        """An UNFROZEN mesh solver reused on a matrix of a different
        storage format must re-setup, not invoke a cached jit whose
        closure captured the other format's SpMV (regression: the rr
        fast path crashed with AttributeError running dist_dia_spmv on a
        ShardedEll after a DIA-profitable solve)."""
        H_band = fd_laplacian_2d(24)                 # DIA-profitable
        H_unst, x_exact, b_unst = dh_test_problem(8)  # ELL route
        rng = np.random.default_rng(3)
        xb = rng.random(H_band.shape[0])
        for precision in ("native", "mixed"):
            s = PCG(CommonSolverArgs(maxiter=4000, tau=1e-10),
                    precision=precision, mesh=mesh).make_solver()
            st1 = s.solve(H_band, H_band.matvec(xb))
            assert st1.success
            st2 = s.solve(H_unst, b_unst)            # same solver, new A
            assert st2.success
            assert np.linalg.norm(np.asarray(st2.soln) - x_exact) <= 1e-6

    def test_gmres_mesh_cgs2(self, mesh):
        """orthog="cgs2" (one all-reduce per Arnoldi step — the
        distributed-friendly orthogonalization) threads through the mesh
        route and matches MGS."""
        H, x_exact, b = dh_test_problem(8)
        control = CommonSolverArgs(maxiter=600, tau=1e-10)
        st = GMRES(control, restart=60, orthog="cgs2",
                   mesh=mesh).make_solver().solve(H, b)
        assert st.success
        assert np.linalg.norm(np.asarray(st.soln) - x_exact) <= 1e-6

    def test_mesh_mixed_rr_no_worse_than_restart_chains(self, mesh,
                                                        monkeypatch):
        """The distributed rr fast path (one dispatch, residual
        replacement over the mesh) must not cost more iterations than
        the restart-chain fallback it replaces."""
        H, _, b = dh_test_problem(10)
        ctl = CommonSolverArgs(maxiter=2000, tau=1e-10)
        st_rr = PCG(ctl, precision="mixed", mesh=mesh).make_solver() \
            .solve(H, b)
        monkeypatch.setenv("PST_RR", "0")
        st_rc = PCG(ctl, precision="mixed", mesh=mesh).make_solver() \
            .solve(H, b)
        assert st_rr.success and st_rc.success
        assert st_rr.iters <= st_rc.iters

    def test_gmres_mesh_mixed(self, mesh):
        H, x_exact, b = dh_test_problem(8)
        st = GMRES(CommonSolverArgs(maxiter=1200, tau=1e-10), restart=60,
                   precision="mixed", mesh=mesh).make_solver().solve(H, b)
        assert st.success
        assert np.linalg.norm(np.asarray(st.soln) - x_exact) <= 1e-6

    def test_gmres_mesh_mixed_f64_fastpath_iters_and_err(self, mesh):
        # the f64 FGMRES fast path (round 3) converges in ONE pass at
        # f64-grade counts (no restart-chain multiples) and f64-grade
        # solution error
        H, x_exact, b = dh_test_problem(10)
        st = GMRES(CommonSolverArgs(maxiter=600, tau=1e-10),
                   precision="mixed", mesh=mesh).make_solver().solve(H, b)
        assert st.success
        # no overshoot knob on the mesh route: err is tau-governed
        assert np.linalg.norm(np.asarray(st.soln) - x_exact) <= 5e-6
        # unpreconditioned f64 GMRES on DH-10 needs ~its in the low
        # hundreds; the old f32 restart chain needed ~3-4x that total
        assert st.iters <= 450
