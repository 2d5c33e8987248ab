"""Matrix-graph visualization: DOT output with C/F coloring.

Capability parity with the reference's stashed `stash/MatrixGraph.py:5-28`
(graphviz rendering of a matrix's adjacency graph with coarse points
colored lightblue and fine points lightgrey).  This implementation emits
the DOT source directly — no `graphviz` package dependency (not in the
baked image); the text renders with any standard `dot` tool.
"""
from __future__ import annotations

from typing import Iterable, Optional

from ..sparse.host import HostCSR


def matrix_graph_dot(A: HostCSR, C: Optional[Iterable[int]] = None,
                     name: str = "graph") -> str:
    """DOT source for the undirected adjacency graph of ``A``.

    Nodes in ``C`` (e.g. the coarse set from ``amg_rs.rs_cf_split``) are
    filled lightblue, others lightgrey — matching the reference's
    rendering (MatrixGraph.py:16-20).  Each off-diagonal entry (i, j) with
    i < j becomes one undirected edge (MatrixGraph.py:22-26).
    """
    cset = set(int(c) for c in C) if C is not None else set()
    lines = [f'graph "{name}" {{']
    n = A.shape[0]
    for i in range(n):
        color = "lightblue" if i in cset else "lightgrey"
        lines.append(f'  {i} [label="{i}", color={color}, style=filled];')
    indptr, indices = A.indptr, A.indices
    for i in range(n):
        for j in indices[indptr[i]:indptr[i + 1]]:
            if i < j:
                lines.append(f"  {i} -- {j};")
    lines.append("}")
    return "\n".join(lines) + "\n"


def write_matrix_graph(A: HostCSR, C: Optional[Iterable[int]] = None,
                       filename: str = "graph.gv") -> str:
    """Write the DOT source to ``filename`` (reference default
    'graph.gv'); returns the path."""
    name = filename.rsplit("/", 1)[-1].rsplit(".", 1)[0]
    with open(filename, "w") as f:
        f.write(matrix_graph_dot(A, C, name=name))
    return filename
