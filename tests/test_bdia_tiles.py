"""Kernel-resident lockstep multi-RHS (tiles layout).

The rows-layout SpMM boundary pays a pad/reshape/transpose pair per
iteration (measured 7.2 of 8.1 ms/iter at k=8, n=2.1M on TPU — the
Pallas kernel itself is ~0.9 ms); cg_solve_multi_tiles keeps the whole
Krylov state in the kernel's (n_tiles+2, b, k, tile) layout so those
moves happen once per solve.  Reference bar: lockstep multi-RHS must
match column-by-column solves (reference PCGSolver.py:109-138 semantics
per column).
"""
import numpy as np
import jax.numpy as jnp

import pysolvers_tpu as pst
from pysolvers_tpu.sparse.bdia import BdiaMatrix
from pysolvers_tpu.problems import fd_vector_laplacian_2d
from pysolvers_tpu.ops.spmv import (bdia_rows_to_tiles, bdia_spmm_rows,
                                    bdia_spmm_tiles, bdia_tile_size,
                                    bdia_tiles_eligible, bdia_tiles_to_rows)


def _prob32(m=16, b=2, k=4, seed=0):
    A = fd_vector_laplacian_2d(m, b=b, coupling=0.3)
    Ad = BdiaMatrix.from_host_csr(A, b=b).astype(jnp.float32)
    rng = np.random.default_rng(seed)
    V = jnp.asarray(rng.random((k, A.shape[0])), dtype=jnp.float32)
    return A, Ad, V


class TestTilesLayout:
    def test_round_trip(self):
        A, Ad, V = _prob32()
        tile = bdia_tile_size(Ad, V.shape[0])
        X4 = bdia_rows_to_tiles(Ad, V, tile)
        back = np.asarray(bdia_tiles_to_rows(Ad, X4))
        np.testing.assert_allclose(back, np.asarray(V), rtol=0, atol=0)

    def test_halo_and_pad_zero(self):
        A, Ad, V = _prob32()
        X4 = np.asarray(bdia_rows_to_tiles(Ad, V, bdia_tile_size(Ad, 4)))
        assert np.all(X4[0] == 0) and np.all(X4[-1] == 0)
        # alignment pad beyond nb stays zero too
        flat = X4[1:-1].transpose(2, 1, 0, 3).reshape(4, Ad.b, -1)
        assert np.all(flat[:, :, Ad.nb:] == 0)

    def test_spmm_tiles_matches_rows(self):
        A, Ad, V = _prob32()
        assert bdia_tiles_eligible(Ad, V.shape[0])
        tile = bdia_tile_size(Ad, V.shape[0])
        Y_rows = np.asarray(bdia_spmm_rows(Ad, V))
        X4 = bdia_rows_to_tiles(Ad, V, tile)
        Y4 = bdia_spmm_tiles(Ad, X4)
        assert Y4.shape == X4.shape            # layout-preserving
        np.testing.assert_allclose(np.asarray(bdia_tiles_to_rows(Ad, Y4)),
                                   Y_rows, rtol=1e-6, atol=1e-6)
        # output halos stay zero so the next apply needs no re-zeroing
        Y4 = np.asarray(Y4)
        assert np.all(Y4[0] == 0) and np.all(Y4[-1] == 0)

    def test_block_jacobi_as_bdia(self):
        from pysolvers_tpu.linear.block_precond import (
            BlockJacobiBdiaPreconditionerType, block_jacobi_bdia_matrix)
        A, Ad, V = _prob32(m=10, b=3, k=2)
        M = block_jacobi_bdia_matrix(Ad)
        assert M.offsets == (0,)
        prec = BlockJacobiBdiaPreconditionerType().form(A_dev=Ad)
        want = np.stack([np.asarray(prec.apply_any(V[j]))
                         for j in range(V.shape[0])])
        got = np.asarray(bdia_spmm_rows(M, V))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_solve_rides_tiles(self, monkeypatch):
        """solve(BdiaMatrix f32, B) takes the kernel-resident route and
        matches per-column solves."""
        calls = {"tiles": 0}
        # _solve_bdia's function-local import resolves at call time, so
        # patching the krylov module intercepts it
        from pysolvers_tpu.linear import krylov as kmod
        real = kmod.cg_solve_multi_tiles

        def spy(*a, **kw):
            calls["tiles"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(kmod, "cg_solve_multi_tiles", spy)
        A, Ad, _ = _prob32(m=12, b=2)
        rng = np.random.default_rng(7)
        X = rng.random((A.shape[0], 3)).astype(np.float32)
        B = np.stack([A.matvec(X[:, j].astype(np.float64))
                      for j in range(3)], axis=1).astype(np.float32)
        st = pst.solve(Ad, B, tau=1e-6, maxiter=2000, precond="bjacobi")
        assert calls["tiles"] == 1
        assert st.success
        for j in range(3):
            st0 = pst.solve(Ad, B[:, j], tau=1e-6, maxiter=2000,
                            precond="bjacobi")
            np.testing.assert_allclose(np.asarray(st.soln[:, j]),
                                       np.asarray(st0.soln),
                                       rtol=2e-4, atol=2e-5)


class TestRowsF64Fallback:
    def test_f64_rows_jit_matches_host_oracle(self):
        """The non-f32 XLA fallback, compiled as ONE jit unit, against
        the f64 host oracle (the original fused transpose->scatter->
        slice graph miscompiled on the axon TPU backend; the compiled-
        on-TPU pin lives in test_tpu_compiled.py)."""
        import jax
        A = fd_vector_laplacian_2d(12, b=3, coupling=0.25,
                                   dtype=np.float64)
        Ad = BdiaMatrix.from_host_csr(A, b=3)
        rng = np.random.default_rng(1)
        V = rng.random((5, A.shape[0]))
        ref = np.stack([Ad.host_matvec_planar(V[j]) for j in range(5)])
        out = np.asarray(jax.jit(
            lambda v: bdia_spmm_rows(Ad, v))(jnp.asarray(V)))
        np.testing.assert_allclose(out, ref, rtol=1e-13, atol=1e-10)


class TestBlockDetect:
    def test_detects_true_blocks_rejects_scalar(self):
        from pysolvers_tpu.sparse.bdia import detect_block_size
        A = fd_vector_laplacian_2d(20, b=5, coupling=0.2)
        assert detect_block_size(A) == 5
        S = pst.problems.fd_laplacian_2d(40)     # scalar, n even
        assert detect_block_size(S) is None

    def test_solve_autoroutes_detected_blocks(self, monkeypatch):
        """solve(HostCSR with b=5 blocks, B) rides the same BDIA route
        as a hand-built BdiaMatrix (VERDICT r4 item 8) — and
        detect_blocks=False keeps the scalar route."""
        calls = {"bdia": 0}
        import sys
        smod = sys.modules["pysolvers_tpu.solve"]
        real = smod._solve_bdia

        def spy(*a, **kw):
            calls["bdia"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(smod, "_solve_bdia", spy)
        monkeypatch.setattr(smod, "_solve_multi",
                            lambda *a, **kw: (_ for _ in ()).throw(
                                AssertionError("scalar multi route")))
        A = fd_vector_laplacian_2d(46, b=5, coupling=0.2,
                                   dtype=np.float64)      # n=10580
        assert A.shape[0] >= 10_000
        rng = np.random.default_rng(3)
        B = rng.random((A.shape[0], 3))
        st = pst.solve(A, B, tau=1e-8, maxiter=4000)
        assert calls["bdia"] == 1 and st.success
        X = np.asarray(st.soln)
        for j in range(3):
            r = (np.linalg.norm(B[:, j] - A.matvec(X[:, j]))
                 / np.linalg.norm(B[:, j]))
            assert r < 1e-7
        Ab = BdiaMatrix.from_host_csr(A, 5)
        st_hand = pst.solve(Ab, B, tau=1e-8, maxiter=4000)
        np.testing.assert_allclose(X, np.asarray(st_hand.soln),
                                   rtol=0, atol=1e-10)

    def test_detect_blocks_false_keeps_scalar(self, monkeypatch):
        import sys
        smod = sys.modules["pysolvers_tpu.solve"]
        monkeypatch.setattr(smod, "_solve_bdia",
                            lambda *a, **kw: (_ for _ in ()).throw(
                                AssertionError("bdia route")))
        A = fd_vector_laplacian_2d(46, b=5, coupling=0.2,
                                   dtype=np.float64)
        rng = np.random.default_rng(3)
        b = rng.random(A.shape[0])
        st = pst.solve(A, b, tau=1e-8, maxiter=4000, detect_blocks=False)
        assert st.success
