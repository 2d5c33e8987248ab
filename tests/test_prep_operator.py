"""Kernel-native operator layout (ops.prep_operator / DiaTiled).

The DIA SpMV kernel consumes (D, n_tiles, tile); XLA materializes that
reshape as a full diagonal copy at every call and does NOT hoist it out
of solver loops (measured 2x whole-matvec cost at n=2.1M).  prep_operator
converts once; these tests pin correctness and the dispatch plumbing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.ops import matvec, matmat, prep_operator
from pysolvers_tpu.sparse.device import DiaMatrix, DiaTiled, EllMatrix


def _dia(m=40, dtype=np.float32):
    H = pst.problems.fd_laplacian_2d(m, dtype=dtype)
    return H, DiaMatrix.from_host_csr(H)


class TestPrepOperator:
    def test_prep_roundtrip_matvec(self):
        H, A = _dia()
        At = prep_operator(A)
        assert isinstance(At, DiaTiled)
        x = np.random.default_rng(0).random(H.shape[0]).astype(np.float32)
        y_ref = H.matvec(x.astype(np.float64))
        y = np.asarray(matvec(At, jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-4)
        y2 = np.asarray(matvec(A, jnp.asarray(x)))
        np.testing.assert_allclose(y, y2, rtol=0, atol=0)  # same kernel

    def test_prep_inside_jit_matches(self):
        H, A = _dia()
        x = jnp.asarray(
            np.random.default_rng(1).random(H.shape[0]).astype(np.float32))

        @jax.jit
        def f(A, v):
            return matvec(prep_operator(A), v)

        np.testing.assert_allclose(np.asarray(f(A, x)),
                                   np.asarray(matvec(A, x)),
                                   rtol=0, atol=0)

    def test_prep_passthrough(self):
        H, A = _dia(dtype=np.float64)
        assert prep_operator(A) is A          # f64 keeps the XLA path
        E = EllMatrix.from_host_csr(H)
        assert prep_operator(E) is E
        arr = jnp.ones((4, 4))
        assert prep_operator(arr) is arr

    def test_tiled_matmat_and_to_dia(self):
        H, A = _dia(m=24)
        At = prep_operator(A)
        X = np.random.default_rng(2).random((H.shape[0], 3)).astype(
            np.float32)
        Y = np.asarray(matmat(At, jnp.asarray(X)))
        Y_ref = np.stack([H.matvec(X[:, j].astype(np.float64))
                          for j in range(3)], axis=1)
        np.testing.assert_allclose(Y, Y_ref, rtol=1e-5, atol=1e-4)
        back = At.to_dia()     # prep may pad rows; the prefix is exact
        np.testing.assert_allclose(
            np.asarray(back.diags)[:, :A.diags.shape[1]],
            np.asarray(A.diags))

    def test_tiled_rides_as_jit_argument(self):
        H, A = _dia(m=24)
        At = prep_operator(A)
        x = jnp.asarray(
            np.random.default_rng(3).random(H.shape[0]).astype(np.float32))

        @jax.jit
        def f(M, v):
            return matvec(M, v)

        np.testing.assert_allclose(np.asarray(f(At, x)),
                                   np.asarray(matvec(A, x)),
                                   rtol=0, atol=0)

    def test_pack_time_alignment_makes_pad_noop(self):
        # n > 32768: DiaMatrix pads rows to the 262144 grid, so any
        # power-of-two kernel tile divides it
        H = pst.problems.fd_laplacian_1d(40_000, dtype=np.float32)
        A = DiaMatrix.from_host_csr(H)
        assert A.diags.shape[1] % 262144 == 0
        At = prep_operator(A)
        assert At.diags3.shape[1] * At.tile == A.diags.shape[1]

    def test_amg_hierarchy_stores_prepped_levels(self):
        from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                              build_device_hierarchy)
        H = pst.problems.fd_laplacian_2d(24, dtype=np.float32)
        mlh = build_sa_hierarchy(H, num_levels=2)
        h = build_device_hierarchy(mlh, smoother="jacobi",
                                   dtype=np.float32)
        assert isinstance(h.levels[-1].A_dev, DiaTiled)
        # V-cycle still runs on the prepped hierarchy
        from pysolvers_tpu.linear.amg import amg_solve
        b = jnp.asarray(np.random.default_rng(4).random(
            H.shape[0]).astype(np.float32))
        x, (k, resid, reason) = amg_solve(h, b, tau=1e-4, maxiter=50)
        assert int(reason) == 1
