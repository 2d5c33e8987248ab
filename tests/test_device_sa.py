"""Device-built unstructured SA Galerkin (VERDICT r2 missing item 1).

build_sa_hierarchy_device computes the smoothed prolongator, the R·A·P
triple product and the coarse inverse ON DEVICE (MXU dense-panel SpGEMM,
parallel/amg_setup.py::_setup_products); only aggregation runs on host.
These tests pin the device-built hierarchy against the host C++/numpy
SpGEMM path (build_sa_hierarchy) to 1e-12 in f64 — same aggregation, so
the products must agree to rounding.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                      build_sa_hierarchy_device,
                                      build_device_hierarchy,
                                      v_cycle, AMGPreconditionerType)
from pysolvers_tpu.sparse.host import HostCSR


def _dh(lev):
    H, x_exact, b = pst.problems.dh_test_problem(lev)
    return HostCSR(H.indptr, H.indices, H.data.astype(np.float64),
                   H.shape), x_exact, b


class TestDeviceGalerkinPinned:
    @pytest.mark.parametrize("lev", [10, 15])
    def test_coarse_operator_pinned_1e12(self, lev):
        H, _, _ = _dh(lev)
        mlh = build_sa_hierarchy(H, num_levels=2)
        A_c_host = mlh.matrices[0].to_dense()
        h = build_sa_hierarchy_device(H, num_levels=2, dtype=np.float64)
        A_c_dev = np.asarray(h.levels[0].A_dev)
        scale = np.abs(A_c_host).max()
        assert np.abs(A_c_dev - A_c_host).max() <= 1e-12 * scale

    def test_transfers_pinned_1e12(self):
        H, _, _ = _dh(10)
        mlh = build_sa_hierarchy(H, num_levels=2)
        h = build_sa_hierarchy_device(H, num_levels=2, dtype=np.float64)
        fine = h.levels[1]
        P_host = mlh.prolongators[0].to_dense()
        R_host = mlh.restrictions[0].to_dense()
        assert np.abs(np.asarray(fine.P_dev) - P_host).max() <= 1e-12
        assert np.abs(np.asarray(fine.R_dev) - R_host).max() <= 1e-12

    def test_v_cycle_matches_host_hierarchy(self):
        H, _, b = _dh(10)
        mlh = build_sa_hierarchy(H, num_levels=2)
        h_host = build_device_hierarchy(mlh, smoother="jacobi",
                                        dtype=np.float64)
        h_dev = build_sa_hierarchy_device(H, num_levels=2,
                                          smoother="jacobi",
                                          dtype=np.float64)
        f = jnp.asarray(b.astype(np.float64))
        x0 = jnp.zeros_like(f)
        y_host = np.asarray(v_cycle(h_host, f, x0))
        y_dev = np.asarray(v_cycle(h_dev, f, x0))
        np.testing.assert_allclose(y_dev, y_host, rtol=1e-11, atol=1e-13)


class TestDeviceSASolves:
    def test_pcg_with_device_sa_preconditioner(self):
        H, x_exact, b = _dh(11)
        from pysolvers_tpu.linear.amg import _amg_apply_fn
        h = build_sa_hierarchy_device(H, num_levels=2, dtype=np.float64)
        apply_fn = _amg_apply_fn(2)
        from pysolvers_tpu.linear.krylov import cg_solve
        from pysolvers_tpu.sparse.device import EllMatrix
        from pysolvers_tpu.ops import matvec as op_matvec
        A = EllMatrix.from_host_csr(H, dtype=np.float64)
        x, st, _ = cg_solve(lambda v: op_matvec(A, v),
                            jnp.asarray(b.astype(np.float64)),
                            maxiter=100, tau=1e-10,
                            precond=lambda v: apply_fn(h, v))
        assert int(st.reason) == 1
        assert np.linalg.norm(np.asarray(x) - x_exact) < 1e-7

    def test_factory_galerkin_device(self):
        H, _, b = _dh(10)
        pt = AMGPreconditionerType(num_iters=2, num_levels=2,
                                   galerkin="device", smoother="jacobi")
        M = pt.form(HostCSR(H.indptr, H.indices,
                            H.data.astype(np.float32), H.shape))
        v = jnp.asarray(b.astype(np.float32))
        y = M.apply_right(v)
        assert np.isfinite(np.asarray(y)).all()
        # traced pair present for the cached-jit route
        assert M.traced is not None

    def test_factory_auto_falls_back_on_memory_gate(self):
        H, _, _ = _dh(10)
        pt = AMGPreconditionerType(num_iters=2, num_levels=2,
                                   galerkin="device", smoother="jacobi")
        import pysolvers_tpu.linear.amg as amg_mod
        H32 = HostCSR(H.indptr, H.indices, H.data.astype(np.float32),
                      H.shape)
        with pytest.raises(ValueError):
            # explicit device request beyond the gate fails loudly
            amg_mod.build_sa_hierarchy_device(H32, 2, max_bytes=1024)
