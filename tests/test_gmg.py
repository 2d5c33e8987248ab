"""Geometric multigrid (linear/gmg.py) — capability parity with the
reference's stashed GMG V-cycle (stash/GMGVCycleSolver.py) rebuilt on the
shared device cycle executor, plus the DOT matrix-graph and LaTeX table
utilities (stash/MatrixGraph.py, stash/Tabulate.py)."""
import numpy as np
import pytest

import pysolvers_tpu as pst
from pysolvers_tpu.linear.gmg import (GMGVCycle, build_gmg_hierarchy,
                                      interp_1d, interp_2d, refinement_ms)
from pysolvers_tpu.problems.laplacian import fd_laplacian_1d, fd_laplacian_2d
from pysolvers_tpu.core import SolverConfig


def test_interp_1d_reproduces_linear_functions():
    # linear interpolation is exact on linear functions vanishing at the
    # boundary-interior transition handled by Dirichlet zeros
    m_c = 7
    m_f = 2 * m_c + 1
    P = interp_1d(m_f, m_c)
    xc = np.arange(1, m_c + 1) / (m_c + 1)       # coarse values of u(x)=x
    xf = P.matvec(xc)
    expect = np.arange(1, m_f + 1) / (m_f + 1)
    # interior midpoints/coincident points are exact; endpoints see the
    # (zero) Dirichlet boundary so the last midpoint halves
    assert np.allclose(xf[:-1], expect[:-1], atol=1e-14)


def test_refinement_ms_rejects_uncoarsenable():
    with pytest.raises(ValueError):
        refinement_ms(8, 2)       # even m can't coarsen
    assert refinement_ms(31, 3) == [31, 15, 7]


@pytest.mark.parametrize("dims,build", [((31,), fd_laplacian_1d),
                                        ((15, 15), fd_laplacian_2d)])
def test_gmg_hierarchy_galerkin(dims, build):
    A = build(dims[0])
    mlh = build_gmg_hierarchy(A, num_levels=3, dims=dims)
    assert mlh.n_levels == 3
    # Galerkin: A_c = R A P exactly
    P = mlh.prolongators[-1]
    R = mlh.restrictions[-1]
    A_c = mlh.matrices[-2]
    lhs = R.matmat(A.matmat(P))
    x = np.random.default_rng(0).standard_normal(A_c.shape[0])
    assert np.allclose(lhs.matvec(x), A_c.matvec(x), atol=1e-10)


@pytest.mark.parametrize("dims,build,levels", [
    ((63,), fd_laplacian_1d, 3),
    ((31, 31), fd_laplacian_2d, 3),
])
def test_gmg_vcycle_solver_converges(dims, build, levels):
    """GMG as a stationary solver reaches 1e-10 in multigrid-typical
    cycle counts (mesh-independent convergence is the point of MG)."""
    A = build(dims[0])
    n = A.shape[0]
    rng = np.random.default_rng(1)
    x_exact = rng.standard_normal(n)
    b = A.matvec(x_exact)
    solver = GMGVCycle(SolverConfig(maxiter=60, tau=1e-10),
                       dims=dims, num_levels=levels,
                       smoother="jacobi").make_solver()
    st = solver.solve(A, b)
    assert st.success, (st.iters, st.resid)
    assert st.iters < 40
    err = np.linalg.norm(np.asarray(st.soln) - x_exact)
    assert err / np.linalg.norm(x_exact) < 1e-8


def test_gmg_dims_validation():
    A = fd_laplacian_2d(15)
    with pytest.raises(ValueError):
        build_gmg_hierarchy(A, 2, dims=(14, 14))   # size mismatch
    with pytest.raises(ValueError):
        GMGVCycle(SolverConfig(), dims=None)


def test_matrix_graph_dot():
    from pysolvers_tpu.utils import matrix_graph_dot
    A = fd_laplacian_1d(4)
    dot = matrix_graph_dot(A, C=[0, 2], name="g")
    assert dot.startswith('graph "g" {')
    assert '0 [label="0", color=lightblue' in dot
    assert '1 [label="1", color=lightgrey' in dot
    # one undirected edge per i<j off-diagonal pair
    assert dot.count("--") == 3
    assert "0 -- 1;" in dot and "2 -- 3;" in dot


def test_matrix_graph_with_rs_coarse_set(tmp_path):
    from pysolvers_tpu.utils import write_matrix_graph
    from pysolvers_tpu.linear.amg_rs import rs_cf_split
    A = fd_laplacian_2d(5)
    C = np.flatnonzero(rs_cf_split(A))
    p = write_matrix_graph(A, C, filename=str(tmp_path / "graph.gv"))
    text = open(p).read()
    assert "lightblue" in text and "lightgrey" in text


def test_latex_safe_template():
    from pysolvers_tpu.utils import LatexSafeTemplate, render_template
    t = LatexSafeTemplate("??a & $E=mc^2$ & ??b \\\\")
    out = t.substitute({"a": 1, "b": 2.5})
    assert out == "1 & $E=mc^2$ & 2.5 \\\\"
    assert render_template("x=??x", {"x": 7}) == "x=7"


def test_latex_table():
    from pysolvers_tpu.utils import latex_table
    out = latex_table([[1, 2], [3, 4]], header=["a", "b"])
    assert out.startswith("\\begin{tabular}{|c|c|}")
    assert "a & b \\\\" in out
    assert "3 & 4 \\\\" in out
    assert out.rstrip().endswith("\\end{tabular}")
