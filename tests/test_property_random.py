"""Seeded random-matrix property battery (SURVEY §4c analog).

The DH/Laplacian families the rest of the suite uses are well-behaved;
this file drives the one-call front end and the factory preconditioners
over randomly-structured SPD and nonsymmetric systems — different
sparsity every case, fixed seeds so failures reproduce.
"""
import numpy as np
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.core import StopReason
from pysolvers_tpu.sparse import HostCSR


def _random_spd(n, density, seed, shift=None):
    """A = B·Bᵀ + shift·I with random sparse B — SPD with random
    structure; shift controls conditioning."""
    rng = np.random.default_rng(seed)
    m = max(int(density * n * n), 4 * n)
    rows = rng.integers(0, n, m)
    cols = rng.integers(0, n, m)
    vals = rng.standard_normal(m)
    B = HostCSR.from_coo(rows, cols, vals, (n, n))
    A = B.matmat(B.transpose())
    d = np.arange(n)
    s = 0.1 * np.abs(A.diagonal()).max() if shift is None else shift
    return A.add(HostCSR.from_coo(d, d, np.full(n, s), (n, n)))


class TestRandomSPD:
    @pytest.mark.parametrize("seed,n,precond", [
        (0, 600, "none"), (1, 600, "jacobi"), (2, 900, "ic"),
        (3, 900, "amg"), (4, 1200, "jacobi"),
    ])
    def test_solve_converges(self, seed, n, precond):
        A = _random_spd(n, 0.004, seed)
        x_exact = np.random.default_rng(100 + seed).random(n)
        b = A.matvec(x_exact)
        st = pst.solve(A, b, tau=1e-8, maxiter=3000, precond=precond)
        assert st.success, st
        rn = np.linalg.norm(b - A.matvec(np.asarray(st.soln, np.float64)))
        assert rn <= 1e-8 * np.linalg.norm(b) * 1.01

    def test_mixed_precision_random_spd(self):
        A = _random_spd(800, 0.004, 11)
        x_exact = np.random.default_rng(111).random(800)
        b = A.matvec(x_exact)
        st = pst.solve(A, b, tau=1e-10, maxiter=3000, precond="jacobi",
                       precision="mixed")
        assert st.success, st
        rn = np.linalg.norm(b - A.matvec(np.asarray(st.soln, np.float64)))
        assert rn <= 1e-10 * np.linalg.norm(b) * 1.01


class TestRandomNonsymmetric:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_gmres_ilut_random(self, seed):
        rng = np.random.default_rng(200 + seed)
        n = 700
        # diagonally-dominant random nonsymmetric system
        m = 6 * n
        rows = rng.integers(0, n, m)
        cols = rng.integers(0, n, m)
        vals = rng.standard_normal(m) * 0.05
        A = HostCSR.from_coo(rows, cols, vals, (n, n))
        d = np.arange(n)
        A = A.add(HostCSR.from_coo(d, d, 1.0 + rng.random(n), (n, n)))
        x_exact = rng.random(n)
        b = A.matvec(x_exact)
        st = pst.solve(A, b, tau=1e-8, maxiter=1500, method="gmres",
                       precond="ilut")
        assert st.success, st
        rn = np.linalg.norm(b - A.matvec(np.asarray(st.soln, np.float64)))
        assert rn <= 1e-8 * np.linalg.norm(b) * 1.01


class TestGracefulFailure:
    def test_direct_on_singular_reports_failure(self):
        """The direct route wraps solver errors in a failed SolveStatus
        (reference DefaultDirectSolver.py:72-74) instead of raising."""
        n = 40
        d = np.arange(n)
        vals = np.ones(n)
        vals[7] = 0.0                     # exactly singular diagonal
        A = HostCSR.from_coo(d, d, vals, (n, n))
        st = pst.solve(A, np.ones(n), method="direct")
        assert isinstance(st, pst.SolveStatus)
        assert not st.success

    def test_cg_on_indefinite_terminates(self):
        """CG on an indefinite matrix must terminate with a non-success
        status (breakdown/maxiter), never hang or return success=True
        with a bad residual."""
        n = 600
        rng = np.random.default_rng(42)
        d = np.arange(n)
        vals = rng.standard_normal(n)     # indefinite diagonal
        A = _random_spd(n, 0.003, 7).add(
            HostCSR.from_coo(d, d, -3.0 * np.abs(vals) - 5.0, (n, n)))
        b = rng.random(n)
        st = pst.solve(A, b, tau=1e-10, maxiter=300, method="cg",
                       precond="none")
        if st.success:
            rn = np.linalg.norm(
                b - A.matvec(np.asarray(st.soln, np.float64)))
            assert rn <= 1e-10 * np.linalg.norm(b) * 1.5
