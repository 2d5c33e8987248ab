"""Unstructured FEM/graph problem generators + the large-scale SA-AMG
pipeline (VERDICT r3 item 1) at CPU-test scale.

The pipeline under test is exactly benchmarks/unstructured_amg.py's:
RCM reorder -> host SA setup (C++ SpGEMM) -> BWS device hierarchy ->
PCG + AMG(mixed) to 1e-10 — on a genuinely unstructured matrix
(random node numbering, variable connectivity), not a DIA stencil.
"""
import numpy as np
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.problems.fem import (fem_poisson_2d_unstructured,
                                        graph_laplacian_rgg)
from pysolvers_tpu.sparse.host import HostCSR


class TestFemGenerator:
    def test_matches_5pt_stencil_in_structured_limit(self):
        from pysolvers_tpu.problems import fd_laplacian_2d
        A = fem_poisson_2d_unstructured(8, jitter=0.0, coeff=False,
                                        shuffle=False)
        F = fd_laplacian_2d(7).to_dense() * (1.0 / 8) ** 2
        np.testing.assert_allclose(A.to_dense(), F, atol=1e-12)

    def test_spd_and_symmetric(self):
        A = fem_poisson_2d_unstructured(12, seed=2)
        Ad = A.to_dense()
        assert np.abs(Ad - Ad.T).max() == 0.0
        w = np.linalg.eigvalsh(Ad)
        assert w.min() > 0

    def test_unstructured_degrees_vary(self):
        A = fem_poisson_2d_unstructured(16, seed=0)
        nnz = A.row_nnz()
        assert nnz.min() < nnz.max()          # not a constant stencil
        # shuffled numbering: large bandwidth before RCM
        rows, cols, _ = A.to_coo()
        assert np.abs(rows - cols).max() > A.shape[0] // 4

    def test_deterministic(self):
        A1 = fem_poisson_2d_unstructured(8, seed=5)
        A2 = fem_poisson_2d_unstructured(8, seed=5)
        np.testing.assert_array_equal(A1.data, A2.data)

    def test_graph_laplacian_rgg(self):
        G = graph_laplacian_rgg(2000, seed=1)
        Gd = G.to_dense()
        assert np.abs(Gd - Gd.T).max() < 1e-12
        w = np.linalg.eigvalsh(Gd)
        assert w.min() > 0                    # shifted: strictly SPD


class TestUnstructuredSAMG:
    def _pipeline(self, m=40, levels=3):
        from pysolvers_tpu.sparse.bws import BwsMatrix
        A = fem_poisson_2d_unstructured(m, seed=3)
        perm = BwsMatrix._rcm_perm(A)
        Ap = A.permute_symmetric(perm)
        rng = np.random.default_rng(7)
        x = rng.normal(size=A.shape[0])
        return Ap, x, Ap.matvec(x)

    def test_pcg_samg_mixed_to_1e10(self):
        Ap, x_true, b = self._pipeline()
        from pysolvers_tpu.api import PCG, CommonSolverArgs
        from pysolvers_tpu.linear.amg import AMGPreconditionerType
        control = CommonSolverArgs(maxiter=2000, tau=1e-10)
        amg = AMGPreconditionerType(num_iters=2, num_levels=3,
                                    galerkin="host")
        st = PCG(control, precond=amg,
                 precision="mixed").make_solver().solve(Ap, b)
        assert st.success
        r = b - Ap.matvec(np.asarray(st.soln, dtype=np.float64))
        assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(b) * 1.01
        assert np.abs(np.asarray(st.soln) - x_true).max() \
            / np.abs(x_true).max() < 1e-7

    def test_samg_iteration_count_beats_plain_cg(self):
        # the capability claim at test scale: SA-AMG cuts iterations by
        # >10x on the unstructured problem (wall-clock is the TPU
        # benchmark's job, benchmarks/unstructured_amg.py)
        Ap, _, b = self._pipeline(m=40)
        st_amg = pst.solve(Ap, b, tau=1e-10, maxiter=4000, method="cg",
                           precond="amg", precision="mixed")
        st_cg = pst.solve(Ap, b, tau=1e-10, maxiter=4000, method="cg",
                          precond="none", precision="mixed")
        assert st_amg.success and st_cg.success
        assert st_amg.iters * 10 <= st_cg.iters

    def test_bws_hierarchy_levels(self):
        # matrix_format="bws" packs every level + transfer (CPU interpret)
        from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                              build_device_hierarchy)
        from pysolvers_tpu.sparse.bws import BwsMatrix
        Ap, _, _ = self._pipeline(m=60)
        mlh = build_sa_hierarchy(
            HostCSR(Ap.indptr, Ap.indices,
                    Ap.data.astype(np.float32), Ap.shape), num_levels=3)
        h = build_device_hierarchy(mlh, smoother="jacobi",
                                   dtype=np.float32, matrix_format="bws")
        assert isinstance(h.levels[-1].A_dev, BwsMatrix)
        assert isinstance(h.levels[-1].P_dev, BwsMatrix)
        assert isinstance(h.levels[-1].R_dev, BwsMatrix)

    def test_fine_level_reuse(self):
        # AMGPreconditionerType.form reuses the solver's packed operator
        from pysolvers_tpu.linear.amg import AMGPreconditionerType
        from pysolvers_tpu.sparse.bws import BwsMatrix
        Ap, _, _ = self._pipeline(m=60)
        Ap32 = HostCSR(Ap.indptr, Ap.indices,
                       Ap.data.astype(np.float32), Ap.shape)
        A_dev = BwsMatrix.from_host_csr(Ap32, dtype=np.float32,
                                        use_rcm=False)
        amg = AMGPreconditionerType(num_iters=1, num_levels=3,
                                    galerkin="host", matrix_format="bws")
        prec = amg.form(Ap32, A_dev)
        h = prec.traced[1]
        assert h.levels[-1].A_dev is A_dev
