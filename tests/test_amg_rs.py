"""Classical Ruge-Stüben AMG tests."""
import numpy as np

import jax.numpy as jnp

from pysolvers_tpu.core import SolverConfig
from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                      build_device_hierarchy, v_cycle)
from pysolvers_tpu.linear.amg_rs import rs_cf_split, rs_coarsen
from pysolvers_tpu.ops import matvec
from pysolvers_tpu.problems import fd_laplacian_2d


class TestRSCoarsening:
    def test_cf_split_valid(self):
        H = fd_laplacian_2d(10)
        c = rs_cf_split(H)
        assert set(np.unique(c)) <= {0, 1}
        n_c = c.sum()
        assert 0 < n_c < H.shape[0]
        # roughly half the points coarse for the 5-point stencil
        assert 0.2 < n_c / H.shape[0] < 0.8

    def test_coarse_operator(self):
        H = fd_laplacian_2d(10)
        P, R, A_c = rs_coarsen(H)
        assert A_c.shape[0] == A_c.shape[1] == P.shape[1]
        w = np.linalg.eigvals(A_c.to_dense())
        assert (w.real > 0).all()

    def test_rs_vcycle_converges(self):
        H = fd_laplacian_2d(12)
        rng = np.random.default_rng(0)
        x_exact = rng.random(H.shape[0])
        b = jnp.asarray(H.matvec(x_exact))
        mlh = build_sa_hierarchy(H, num_levels=3, coarsening="rs")
        h = build_device_hierarchy(mlh, "gs", 2, 2)
        x = jnp.zeros_like(b)
        A_dev = h.levels[-1].A_dev
        r0 = float(jnp.linalg.norm(b))
        r = r0
        for _ in range(80):
            x = v_cycle(h, b, x)
            r = float(jnp.linalg.norm(b - matvec(A_dev, x)))
            if r <= 1e-10 * r0:
                break
        assert r <= 1e-10 * r0
        np.testing.assert_allclose(np.asarray(x), x_exact, atol=1e-6)


class TestRsEdgeCases:
    def test_isolated_points_become_f(self):
        """Dirichlet/identity rows (no strong connections) must be
        F-points — making them C kept them on every coarse level."""
        import numpy as np
        from pysolvers_tpu.sparse.host import HostCSR
        from pysolvers_tpu.linear.amg_rs import rs_cf_split
        n = 8
        H = HostCSR.from_coo(np.arange(n), np.arange(n),
                             2.0 + np.arange(n) % 3, (n, n),
                             sum_duplicates=False)
        assert rs_cf_split(H).sum() == 0

    def test_sign_flipped_matrix_coarsens(self):
        """Rows with no negative couplings use the magnitude fallback the
        docstring promises — a sign-flipped Laplacian must still split."""
        import numpy as np
        from pysolvers_tpu.sparse.host import HostCSR
        from pysolvers_tpu.linear.amg_rs import rs_cf_split
        from pysolvers_tpu.problems import fd_laplacian_1d
        L = fd_laplacian_1d(16)
        r, c, v = L.to_coo()
        Hf = HostCSR.from_coo(r, c, -v, L.shape, sum_duplicates=False)
        f = rs_cf_split(Hf)
        assert 0 < f.sum() < 16
