"""Block-window SELL format + kernel tests (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pysolvers_tpu.sparse import HostCSR
from pysolvers_tpu.sparse.bws import BwsMatrix
from pysolvers_tpu.ops.bws_spmv import bws_matvec
from pysolvers_tpu.problems import fd_laplacian_2d, dh_test_problem


def check(H, seed=0, use_rcm=True):
    n = H.shape[0]
    A = BwsMatrix.from_host_csr(H, dtype=np.float32, use_rcm=use_rcm)
    x = np.random.default_rng(seed).random(n).astype(np.float32)
    y = bws_matvec(A, jnp.asarray(x), interpret=True)
    ref = H.matvec(x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)
    return A


class TestBws:
    def test_laplacian_small(self):
        check(fd_laplacian_2d(12, dtype=np.float64))

    def test_laplacian_no_rcm(self):
        check(fd_laplacian_2d(10, dtype=np.float64), use_rcm=False)

    def test_dh_matrix(self):
        A = check(dh_test_problem(10)[0])
        # DH needs RCM to keep the window small
        assert A.win_blocks <= 64

    def test_dense_band(self):
        rng = np.random.default_rng(1)
        n = 300
        D = np.zeros((n, n))
        for off in range(-3, 4):
            idx = np.arange(max(0, -off), min(n, n - off))
            D[idx, idx + off] = rng.standard_normal(len(idx))
        check(HostCSR.from_dense(D))

    def test_row_heavier_than_slots_spills(self):
        # one row with 40 nnz in the same 128-block → needs spill segments
        rng = np.random.default_rng(2)
        n = 200
        D = np.eye(n)
        D[5, :40] = rng.standard_normal(40) + 2.0
        A = check(HostCSR.from_dense(D), use_rcm=False)
        assert A.n_segments >= 3


class TestTileSize:
    def test_gt_variants_match_reference(self):
        """Every legal tile size yields the same matvec (aligned-base
        deltas) — including tiles whose first row-block is not 8-aligned."""
        H, _, _ = dh_test_problem(10)
        n = H.shape[0]
        x = np.random.default_rng(3).random(n).astype(np.float32)
        ref = H.matvec(x.astype(np.float64))
        for gr, gts in ((32, (128, 64, 32, 16, 8)), (16, (32, 8)),
                        (8, (64, 16))):
            for gt in gts:
                A = BwsMatrix.from_host_csr(H, dtype=np.float32,
                                            group_rows=gr, gt=gt)
                assert A.gt == gt
                y = bws_matvec(A, jnp.asarray(x), interpret=True)
                np.testing.assert_allclose(np.asarray(y), ref,
                                           rtol=2e-4, atol=2e-4)

    def test_gt_auto_reduces_classed_slots(self):
        H, _, _ = dh_test_problem(12)
        A128 = BwsMatrix.from_host_csr(H, dtype=np.float32, gt=128)
        Aauto = BwsMatrix.from_host_csr(H, dtype=np.float32, gt="auto")
        assert Aauto.classed_slots <= A128.classed_slots
        x = np.random.default_rng(4).random(H.shape[0]).astype(np.float32)
        y = bws_matvec(Aauto, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(y),
                                   H.matvec(x.astype(np.float64)),
                                   rtol=2e-4, atol=2e-4)

    def test_gt_invalid_raises(self):
        H = fd_laplacian_2d(12, dtype=np.float64)
        with pytest.raises(ValueError, match="gt"):
            BwsMatrix.from_host_csr(H, group_rows=8, gt=8)


class TestRectangular:
    """Rectangular packs (AMG transfer operators): per-tile window bases
    decouple column position from row position."""

    def _rand_rect(self, n_rows, n_cols, per_row, seed, ratio):
        rng = np.random.default_rng(seed)
        rows = np.repeat(np.arange(n_rows), per_row)
        # banded-ish: columns near row * ratio (aggregation-ordered P/R)
        centers = (np.arange(n_rows) * ratio).astype(np.int64)
        cols = np.clip(np.repeat(centers, per_row)
                       + rng.integers(-3, 4, size=len(rows)),
                       0, n_cols - 1)
        vals = rng.standard_normal(len(rows))
        from pysolvers_tpu.sparse import HostCSR
        return HostCSR.from_coo(rows, cols, vals, (n_rows, n_cols))

    def _check_rect(self, H):
        from pysolvers_tpu.ops.bws_spmv import bws_spmv
        A = BwsMatrix.from_host_csr(H, dtype=np.float32, use_rcm=False)
        x = np.random.default_rng(9).random(H.shape[1]).astype(np.float32)
        y = bws_spmv(A, jnp.asarray(x), interpret=True)
        ref = H.matvec(x.astype(np.float64))
        assert y.shape[0] == H.shape[0]
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-4)

    def test_tall_prolongator_shape(self):
        self._check_rect(self._rand_rect(2000, 500, 3, 0, 0.25))

    def test_wide_restrictor_shape(self):
        self._check_rect(self._rand_rect(500, 2000, 6, 1, 4.0))

    def test_rcm_rejected_for_rect(self):
        H = self._rand_rect(400, 100, 3, 2, 0.25)
        with pytest.raises(ValueError, match="use_rcm"):
            BwsMatrix.from_host_csr(H, use_rcm=True)


class TestTileClasses:
    def test_class_path_matches_single(self):
        import dataclasses
        import jax.numpy as jnp
        from pysolvers_tpu.ops.bws_spmv import bws_spmv
        H, _, _ = dh_test_problem(12)
        # explicit small-tile geometry: guarantees multiple segment classes
        A = BwsMatrix.from_host_csr(H, dtype=np.float32, group_rows=32,
                                    gt=32)
        assert len(A.s_classes) >= 2
        x = jnp.asarray(np.random.default_rng(0).random(
            H.shape[0]).astype(np.float32))
        # force both paths through the class machinery and the plain kernel
        y_cls = bws_spmv(A, x, interpret=True)
        y_one = bws_spmv(dataclasses.replace(A, s_classes=()), x,
                         interpret=True)
        np.testing.assert_array_equal(np.asarray(y_cls), np.asarray(y_one))


class TestWindowedX:
    """Above X2_RESIDENT_BYTES the kernels fetch two W_pad-aligned x
    blocks per tile instead of keeping the whole vector VMEM-resident
    (the residency mode scoped-vmem-OOMs at n=4.2M: 18.11M vs the 16M
    limit).  Forcing a tiny budget must not change a single bit."""

    def _force(self, monkeypatch, budget):
        from pysolvers_tpu.ops import bws_spmv as mod
        monkeypatch.setattr(mod, "X2_RESIDENT_BYTES", budget)

    def test_windowed_matches_resident(self, monkeypatch):
        from pysolvers_tpu.ops.bws_spmv import bws_spmv
        H, _, _ = dh_test_problem(12)
        A = BwsMatrix.from_host_csr(H, dtype=np.float32)
        x = jnp.asarray(np.random.default_rng(1).random(
            H.shape[0]).astype(np.float32))
        y_res = np.asarray(bws_spmv(A, x, interpret=True))
        self._force(monkeypatch, 0)
        y_win = np.asarray(bws_spmv(A, x, interpret=True))
        np.testing.assert_array_equal(y_win, y_res)

    def test_windowed_class_path(self, monkeypatch):
        import dataclasses
        from pysolvers_tpu.ops.bws_spmv import bws_spmv
        H, _, _ = dh_test_problem(12)
        A = BwsMatrix.from_host_csr(H, dtype=np.float32, group_rows=32,
                                    gt=32)
        assert len(A.s_classes) >= 2
        x = jnp.asarray(np.random.default_rng(2).random(
            H.shape[0]).astype(np.float32))
        y_res = np.asarray(bws_spmv(A, x, interpret=True))
        self._force(monkeypatch, 0)
        y_win = np.asarray(bws_spmv(A, x, interpret=True))
        np.testing.assert_array_equal(y_win, y_res)
        # and the single-call fallback under the same budget
        y_one = np.asarray(bws_spmv(dataclasses.replace(A, s_classes=()),
                                    x, interpret=True))
        np.testing.assert_array_equal(y_one, y_res)

    def test_windowed_rect_transfer(self, monkeypatch):
        """Rectangular packs (AMG transfers) ride the same windows."""
        from pysolvers_tpu.ops.bws_spmv import bws_spmv
        rng = np.random.default_rng(3)
        n_rows, n_cols, per_row = 300, 900, 5
        rows = np.repeat(np.arange(n_rows), per_row)
        cols = rng.integers(0, n_cols, size=rows.size)
        vals = rng.random(rows.size)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        keep = np.ones(len(rows), dtype=bool)
        keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        H = HostCSR(indptr, cols.astype(np.int64), vals,
                    (n_rows, n_cols))
        A = BwsMatrix.from_host_csr(H, dtype=np.float32, use_rcm=False)
        x = jnp.asarray(rng.random(n_cols).astype(np.float32))
        y_res = np.asarray(bws_spmv(A, x, interpret=True))
        self._force(monkeypatch, 0)
        y_win = np.asarray(bws_spmv(A, x, interpret=True))
        np.testing.assert_array_equal(y_win, y_res)
