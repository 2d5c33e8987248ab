"""Native C++ setup kernels vs pure-Python fallbacks (SURVEY §4e parity)."""
import os

import numpy as np
import pytest
import scipy.sparse as sp

from pysolvers_tpu.sparse import HostCSR, read_mtx
from pysolvers_tpu.utils import native
from pysolvers_tpu.problems import fd_laplacian_2d


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def to_host(S):
    S = S.tocsr()
    S.sort_indices()
    return HostCSR(S.indptr.astype(np.int64), S.indices.astype(np.int32),
                   S.data.copy(), S.shape)


class TestNativeSpGEMM:
    def test_matches_scipy(self):
        rng = np.random.default_rng(0)
        A = sp.random(80, 60, 0.1, random_state=rng, format="csr")
        B = sp.random(60, 70, 0.1, random_state=rng, format="csr")
        C = to_host(A).matmat(to_host(B))
        np.testing.assert_allclose(C.to_dense(), (A @ B).toarray(),
                                   atol=1e-13)

    def test_matches_python_fallback(self, monkeypatch):
        rng = np.random.default_rng(1)
        A = sp.random(40, 40, 0.15, random_state=rng, format="csr")
        C_native = to_host(A).matmat(to_host(A))
        monkeypatch.setenv("PST_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        C_py = to_host(A).matmat(to_host(A))
        np.testing.assert_allclose(C_native.to_dense(), C_py.to_dense(),
                                   atol=1e-13)


class TestNativeILUT:
    def test_exact_factorization(self):
        from pysolvers_tpu.linear.ilu import ilut_factor
        H = fd_laplacian_2d(6)
        L, U = ilut_factor(H, drop_tol=0.0, fill_factor=1e6)
        np.testing.assert_allclose(L.matmat(U).to_dense(), H.to_dense(),
                                   atol=1e-8)

    def test_matches_python_fallback(self, monkeypatch):
        from pysolvers_tpu.linear import ilu as ilu_mod
        H = fd_laplacian_2d(7)
        Ln, Un = ilu_mod.ilut_factor(H, drop_tol=1e-3, fill_factor=10)
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        Lp, Up = ilu_mod.ilut_factor(H, drop_tol=1e-3, fill_factor=10)
        # same algorithm → identical sparsity and values
        np.testing.assert_allclose(Ln.to_dense(), Lp.to_dense(), atol=1e-12)
        np.testing.assert_allclose(Un.to_dense(), Up.to_dense(), atol=1e-12)


class TestNativeLevelize:
    def test_matches_python(self, monkeypatch):
        from pysolvers_tpu.ops import trisolve as ts
        rng = np.random.default_rng(2)
        S = sp.tril(sp.random(50, 50, 0.1, random_state=rng)).tolil()
        S.setdiag(1.0)
        H = to_host(S.tocsr())
        lv_native = ts._levelize(H.indptr, H.indices, 50, True)
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        lv_py = ts._levelize(H.indptr, H.indices, 50, True)
        np.testing.assert_array_equal(lv_native, lv_py)


class TestNativeRCM:
    def test_reduces_bandwidth(self):
        H = fd_laplacian_2d(12)  # lexicographic bandwidth = 12
        perm = native.rcm(H.indptr, H.indices, H.shape[0])
        assert perm is not None
        assert sorted(perm) == list(range(144))
        rows, cols, _ = H.to_coo()
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        bw = np.abs(inv[rows] - inv[cols]).max()
        assert bw <= 2 * 12 + 2


class TestNativeMtx:
    def test_dh_matches_scipy(self):
        import scipy.io as sio
        path = "/root/reference/TestMatrices/DH-Matrix-7.mtx"
        H = read_mtx(path)
        S = sio.mmread(path).tocsr()
        np.testing.assert_allclose(H.to_dense(), S.toarray(), atol=1e-14)
