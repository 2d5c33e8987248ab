"""Fused one-dispatch setup (ops/fuse.py): blob packing round trips and
multi-item builds match the separate-dispatch results."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.ops.fuse import (SetupItem, blob_pack, blob_split,
                                    fused_build)
from pysolvers_tpu.sparse.bws import BwsMatrix
from pysolvers_tpu.sparse.host import HostCSR


def _banded(n=700, seed=0, spd=False):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), 5)
    cols = (rows + rng.integers(-40, 40, len(rows))) % n
    vals = rng.standard_normal(len(rows))
    H = HostCSR.from_coo(rows, cols, vals, (n, n))
    if spd:
        Ht = H.transpose()
        H = H.add(Ht)
        d = np.abs(H.to_dense()).sum(axis=1) + 1.0
        H = H.add(HostCSR.from_coo(np.arange(n), np.arange(n), d, (n, n)))
    return H


class TestBlob:
    def test_roundtrip_all_kinds(self):
        arrays = [
            np.arange(7, dtype=np.int32).reshape(7),
            np.linspace(-2, 3, 6, dtype=np.float32).reshape(2, 3),
            np.array([1.5, -2.25, 1e-300, 3e200], dtype=np.float64),
            np.arange(9, dtype=np.uint8),
            np.array([[5, -6], [7, 8]], dtype=np.int64),
        ]
        blob, specs = blob_pack(arrays)
        assert blob.dtype == np.int32
        out = jax.jit(lambda b: tuple(blob_split(b, specs)))(
            jnp.asarray(blob))
        for a, o in zip(arrays, out):
            got = np.asarray(o)
            assert got.shape == a.shape
            np.testing.assert_array_equal(got.astype(np.float64),
                                          a.astype(np.float64))

    def test_int64_overflow_rejected(self):
        with pytest.raises(ValueError):
            blob_pack([np.array([2 ** 40], dtype=np.int64)])

    def test_fused_build_multi_item(self):
        a = np.arange(12, dtype=np.float32)
        b = np.arange(5, dtype=np.int32)

        outs = fused_build([
            SetupItem((a,), _sum_build, ()),
            SetupItem((b,), _scale_build, (3,)),
        ])
        assert float(outs[0]) == float(a.sum())
        np.testing.assert_array_equal(np.asarray(outs[1]), b * 3)


def _sum_build(arrs, st):
    return jnp.sum(arrs[0])


def _scale_build(arrs, st):
    return arrs[0] * st[0]


class TestFusedSetup:
    def test_bws_host_pack_matches_direct(self):
        H = _banded()
        A_direct = BwsMatrix.from_host_csr(H, dtype=np.float32)
        item, assemble, perm = BwsMatrix.host_pack(H, dtype=np.float32)
        (out,) = fused_build([item])
        A_fused = assemble(out)
        np.testing.assert_array_equal(np.asarray(A_fused.perm), perm)
        np.testing.assert_array_equal(np.asarray(A_fused.data),
                                      np.asarray(A_direct.data))
        np.testing.assert_array_equal(np.asarray(A_fused.lidx),
                                      np.asarray(A_direct.lidx))
        np.testing.assert_array_equal(np.asarray(A_fused.delta),
                                      np.asarray(A_direct.delta))
        assert A_fused.s_classes == A_direct.s_classes
        assert A_fused.win_blocks == A_direct.win_blocks

    def test_ic_prep_fuses_with_pack(self):
        """Operator pack + IC factor-plan build in ONE dispatch produce
        the same preconditioner as the separate form() route."""
        from pysolvers_tpu.linear.ilu import ICPreconditionerType

        H = _banded(spd=True)
        item_A, asm_A, perm = BwsMatrix.host_pack(H, dtype=np.float32)
        ip = np.empty(len(perm), dtype=np.int64)
        ip[perm] = np.arange(len(perm))
        rows, cols, vals = H.to_coo()
        Hp = HostCSR.from_coo(ip[rows], ip[cols], vals, H.shape)
        Hp32 = HostCSR(Hp.indptr, Hp.indices,
                       Hp.data.astype(np.float32), Hp.shape)

        t = ICPreconditionerType(1e-3, 15, trisolve_mode="block")
        pp = t.prep(Hp32)
        assert pp is not None
        outs = fused_build([item_A, pp[0]])
        asm_A(outs[0])
        prec_fused = pp[1](outs[1])

        prec_direct = ICPreconditionerType(
            1e-3, 15, trisolve_mode="block").form(Hp32)
        v = np.random.default_rng(1).standard_normal(
            H.shape[0]).astype(np.float32)
        yf = np.asarray(prec_fused.apply_right(jnp.asarray(v)))
        yd = np.asarray(prec_direct.apply_right(jnp.asarray(v)))
        np.testing.assert_allclose(yf, yd, rtol=1e-6, atol=1e-6)

    def test_ilut_prep_fuses(self):
        from pysolvers_tpu.linear.ilu import ILUTPreconditionerType

        H = _banded(seed=3)
        # diagonal boost so the factorization is stable
        n = H.shape[0]
        H = H.add(HostCSR.from_coo(np.arange(n), np.arange(n),
                                   np.full(n, 8.0), (n, n)))
        t = ILUTPreconditionerType(1e-3, 15, trisolve_mode="block")
        pp = t.prep(HostCSR(H.indptr, H.indices,
                            H.data.astype(np.float32), H.shape))
        assert pp is not None
        (out,) = fused_build([pp[0]])
        prec = pp[1](out)
        v = np.random.default_rng(2).standard_normal(n).astype(np.float32)
        y = np.asarray(prec.apply_right(jnp.asarray(v)))
        assert np.isfinite(y).all()

    def test_prep_none_for_non_block_modes(self):
        from pysolvers_tpu.linear.ilu import ICPreconditionerType

        t = ICPreconditionerType(1e-3, 15, trisolve_mode="level")
        assert t.prep(_banded(spd=True)) is None


class TestFusedMixedSolve:
    def test_mixed_factory_fused_path(self, monkeypatch):
        """Force the backend branch that fuses pack+prec and check the
        full factory solve still reaches 1e-10."""
        import pysolvers_tpu.api as api

        monkeypatch.setattr(api, "_bws_backend", lambda: True)
        H = _banded(spd=True)
        x_exact = np.random.default_rng(5).standard_normal(H.shape[0])
        b = H.matvec(x_exact)
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=400, tau=1e-10),
                         precond=pst.RightIC(1e-3, 15,
                                             trisolve_mode="block"),
                         precision="mixed").make_solver()
        st = solver.solve(H, b)
        assert st.success
        err = np.linalg.norm(np.asarray(st.soln) - x_exact)
        assert err < 1e-6 * np.linalg.norm(x_exact)
        # frozen matrix + prec: repeat solve reuses the fused products
        solver.freeze_matrix()
        solver.freeze_prec()
        st2 = solver.solve(H, b)
        assert st2.success


class TestSymbolicPackCache:
    def test_same_structure_repack_matches_fresh(self):
        """A re-pack with new values on cached structure must equal a
        fresh pack of the same matrix (cache cleared)."""
        from pysolvers_tpu.sparse import bws as bws_mod

        H1 = _banded(seed=11)
        rng = np.random.default_rng(12)
        H2 = HostCSR(H1.indptr, H1.indices,
                     rng.standard_normal(H1.nnz), H1.shape)

        bws_mod._PACK_CACHE.clear()
        A1 = BwsMatrix.from_host_csr(H1, dtype=np.float32)
        assert len(bws_mod._PACK_CACHE) == 1
        A2_cached = BwsMatrix.from_host_csr(H2, dtype=np.float32)

        bws_mod._PACK_CACHE.clear()
        A2_fresh = BwsMatrix.from_host_csr(H2, dtype=np.float32)

        np.testing.assert_array_equal(np.asarray(A2_cached.data),
                                      np.asarray(A2_fresh.data))
        np.testing.assert_array_equal(np.asarray(A2_cached.lidx),
                                      np.asarray(A2_fresh.lidx))
        np.testing.assert_array_equal(np.asarray(A2_cached.perm),
                                      np.asarray(A2_fresh.perm))
        assert A2_cached.s_classes == A2_fresh.s_classes
        # values actually differ from the first pack (not a stale hit)
        assert not np.array_equal(np.asarray(A2_cached.data),
                                  np.asarray(A1.data))

    def test_different_structure_not_aliased(self):
        from pysolvers_tpu.sparse import bws as bws_mod

        bws_mod._PACK_CACHE.clear()
        H1 = _banded(seed=21)
        H3 = _banded(n=704, seed=22)
        BwsMatrix.from_host_csr(H1, dtype=np.float32)
        A3 = BwsMatrix.from_host_csr(H3, dtype=np.float32)
        assert len(bws_mod._PACK_CACHE) == 2
        assert A3.shape == (704, 704)
