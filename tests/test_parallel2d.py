"""2-D block-partitioned SpMV + solver tests on the virtual 8-device CPU
mesh (SURVEY §2.3's "1D/2D device mesh" plan; the reference is serial)."""
import numpy as np
import pytest

import jax

from pysolvers_tpu.core import StopReason
from pysolvers_tpu.linear import cg_solve
from pysolvers_tpu.parallel import (make_mesh_2d, shard_ell_2d,
                                    dist_ell_2d_spmv, pad_vector_2d,
                                    unpad_vector_2d)
from pysolvers_tpu.problems import (fd_laplacian_1d, fd_laplacian_2d,
                                    dh_test_problem)


@pytest.mark.parametrize("pr,pc", [(4, 2), (2, 4), (8, 1), (1, 8), (2, 2)])
def test_spmv_matches_host_grids(pr, pc):
    assert len(jax.devices()) >= pr * pc
    mesh = make_mesh_2d(pr, pc)
    H = fd_laplacian_2d(16)          # n=256
    A = shard_ell_2d(H, mesh)
    x = np.random.default_rng(0).random(256)
    xd = pad_vector_2d(A, x)
    y = jax.jit(dist_ell_2d_spmv)(A, xd)
    np.testing.assert_allclose(unpad_vector_2d(A, y), H.matvec(x),
                               rtol=1e-12)


def test_spmv_uneven_n():
    mesh = make_mesh_2d(2, 4)
    H = fd_laplacian_1d(101)         # pads to sub*8
    A = shard_ell_2d(H, mesh)
    x = np.random.default_rng(1).random(101)
    xd = pad_vector_2d(A, x)
    y = jax.jit(dist_ell_2d_spmv)(A, xd)
    np.testing.assert_allclose(unpad_vector_2d(A, y), H.matvec(x),
                               rtol=1e-12)


def test_spmv_unstructured_dh():
    mesh = make_mesh_2d(4, 2)
    H, _, _ = dh_test_problem(8)
    n = H.shape[0]
    A = shard_ell_2d(H, mesh)
    x = np.random.default_rng(2).random(n)
    xd = pad_vector_2d(A, x)
    y = jax.jit(dist_ell_2d_spmv)(A, xd)
    np.testing.assert_allclose(unpad_vector_2d(A, y), H.matvec(x),
                               rtol=1e-12)


def test_layout_stable_under_composition():
    """y = A @ (A @ x) works without any resharding between applies —
    the expand/fold round-trip preserves the joint P((rows, cols))
    layout, which is what lets Krylov loops iterate on one sharding."""
    mesh = make_mesh_2d(2, 4)
    H = fd_laplacian_2d(16)
    A = shard_ell_2d(H, mesh)
    x = np.random.default_rng(3).random(256)
    xd = pad_vector_2d(A, x)

    @jax.jit
    def twice(A, v):
        return dist_ell_2d_spmv(A, dist_ell_2d_spmv(A, v))

    y = twice(A, xd)
    np.testing.assert_allclose(unpad_vector_2d(A, y),
                               H.matvec(H.matvec(x)), rtol=1e-11)


def test_distributed_cg_2d():
    mesh = make_mesh_2d(2, 4)
    H, x_exact, b_host = dh_test_problem(9)
    n = H.shape[0]
    A = shard_ell_2d(H, mesh)
    b = pad_vector_2d(A, b_host)

    @jax.jit
    def solve(A, b):
        return cg_solve(lambda v: dist_ell_2d_spmv(A, v), b,
                        maxiter=800, tau=1e-10)

    x, st, _ = solve(A, b)
    assert int(st.reason) == StopReason.CONVERGED
    np.testing.assert_allclose(unpad_vector_2d(A, x), x_exact, atol=1e-6)
