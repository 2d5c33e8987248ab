"""2-D grid-DIA kernel (ops/grid_spmv.py) — the extreme-band SpMV path
(VERDICT r3 item 3: the HBM-scale cliff fix).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.ops.grid_spmv import GridDiaMatrix, grid_dia_spmv
from pysolvers_tpu.sparse.device import DiaMatrix
from pysolvers_tpu.sparse.host import HostCSR


def _nine_point(m, seed=1):
    """Random-valued 9-point stencil (the Galerkin-coarse shape)."""
    ii, jj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    g = (ii * m + jj)
    rows, cols, vals = [], [], []
    rng = np.random.default_rng(seed)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ni, nj = ii + di, jj + dj
            ok = (ni >= 0) & (ni < m) & (nj >= 0) & (nj < m)
            rows.append(g[ok])
            cols.append((ni * m + nj)[ok])
            vals.append(rng.normal(size=int(ok.sum())))
    return HostCSR.from_coo(np.concatenate(rows), np.concatenate(cols),
                            np.concatenate(vals).astype(np.float32),
                            (m * m, m * m))


class TestGridDia:
    @pytest.mark.parametrize("m", [17, 40])
    def test_five_point_oracle(self, m):
        H = pst.problems.fd_laplacian_2d(m, dtype=np.float32)
        G = GridDiaMatrix.from_dia(DiaMatrix.from_host_csr(H), (m, m))
        x = np.random.default_rng(0).random(m * m).astype(np.float32)
        y = np.asarray(grid_dia_spmv(G, jnp.asarray(x)))
        y_ref = H.matvec(x.astype(np.float64))
        assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5

    def test_nine_point_oracle(self):
        m = 24
        H = _nine_point(m)
        G = GridDiaMatrix.from_dia(DiaMatrix.from_host_csr(H), (m, m))
        x = np.random.default_rng(2).random(m * m).astype(np.float32)
        y = np.asarray(grid_dia_spmv(G, jnp.asarray(x)))
        y_ref = H.matvec(x.astype(np.float64))
        assert np.abs(y - y_ref).max() < 1e-4

    def test_matvec_dispatch(self):
        m = 20
        H = pst.problems.fd_laplacian_2d(m, dtype=np.float32)
        G = GridDiaMatrix.from_dia(DiaMatrix.from_host_csr(H), (m, m))
        from pysolvers_tpu.ops import matvec
        x = jnp.asarray(np.random.default_rng(1).random(m * m)
                        .astype(np.float32))
        np.testing.assert_allclose(np.asarray(matvec(G, x)),
                                   np.asarray(grid_dia_spmv(G, x)),
                                   rtol=0, atol=0)

    def test_from_dia_device_matches_host(self):
        m = 24
        H = _nine_point(m, seed=4)
        A = DiaMatrix.from_host_csr(H)
        Gh = GridDiaMatrix.from_dia(A, (m, m))
        Gd = GridDiaMatrix.from_dia_device(A, (m, m))
        assert Gh.pairs == Gd.pairs
        np.testing.assert_allclose(np.asarray(Gh.diags),
                                   np.asarray(Gd.diags))

    def test_row_wrap_refused(self):
        # a flat +1 offset entry at the end of a grid row wraps to the
        # next row — grid semantics would drop it; from_dia must refuse
        m = 8
        n = m * m
        rows = np.arange(n - 1)
        cols = rows + 1                     # includes wrap positions
        vals = np.ones(n - 1)
        d = np.arange(n)
        H = HostCSR.from_coo(np.concatenate([rows, d]),
                             np.concatenate([cols, d]),
                             np.concatenate([vals, 4.0 * np.ones(n)]),
                             (n, n))
        with pytest.raises(ValueError, match="wrap"):
            GridDiaMatrix.from_dia(DiaMatrix.from_host_csr(H), (m, m))

    def test_undecomposable_offset_refused(self):
        m = 10
        n = m * m
        d = np.arange(n)
        far = np.arange(n - 37)
        H = HostCSR.from_coo(
            np.concatenate([d, far]), np.concatenate([d, far + 37]),
            np.concatenate([4.0 * np.ones(n), np.ones(n - 37)]), (n, n))
        with pytest.raises(ValueError, match="decomposition"):
            GridDiaMatrix.from_dia(DiaMatrix.from_host_csr(H), (m, m))

    def test_gmg_levels_pick_grid_kernel_threshold(self):
        # below the m>=4096 threshold levels stay DiaTiled/DIA
        from pysolvers_tpu.linear.gmg_grid import (
            build_grid_hierarchy_device)
        import jax
        m = 63
        H = pst.problems.fd_laplacian_2d(m, dtype=np.float32)
        A = DiaMatrix.from_host_csr(H)
        h = build_grid_hierarchy_device(A, 2, (m, m), smoother="jacobi")
        assert not isinstance(h.levels[-1].A_dev, GridDiaMatrix)
