"""MatrixMarket I/O (host side, numpy only).

Replaces the reference's use of ``scipy.io.mmread``
(reference: examples/DHTestProblem.py:24).  Supports the ``coordinate``
format with ``real``/``integer`` fields and ``general``/``symmetric``/
``skew-symmetric`` symmetries — everything the bundled DH suite needs
(header: TestMatrices/DH-Matrix-0.mtx:1 ``coordinate real symmetric``).
"""
from __future__ import annotations

import os

import numpy as np

from .host import HostCSR


def _header_nnz(path: str):
    """nnz from the MTX size line (first non-comment line), or None."""
    with open(path, "r", errors="replace") as f:
        first = f.readline()
        if not first.lower().startswith("%%matrixmarket"):
            return None
        for line in f:
            if line.startswith("%"):
                continue
            parts = line.split()
            return int(parts[2]) if len(parts) >= 3 else None
    return None


def read_mtx(path: str) -> HostCSR:
    """Read a MatrixMarket coordinate file into a HostCSR.

    Fast path: native C parser (utils/native.py) for real coordinate files;
    fallback: the pure-Python parser below (also handles integer fields and
    skew symmetry)."""
    from ..utils import native
    try:
        # size buffers from the header's nnz, not the file size (a
        # filesize//8 cap allocated ~3x the file size in RAM up front)
        nnz = _header_nnz(path)
        res = native.mtx_read(path, nnz + 1) if nnz is not None else None
    except Exception:
        res = None
    if res is not None:
        rows, cols, vals, shape, symmetric = res
        if symmetric:
            off = rows != cols
            rows, cols, vals = (np.concatenate([rows, cols[off]]),
                                np.concatenate([cols, rows[off]]),
                                np.concatenate([vals, vals[off]]))
        # sum duplicates like scipy.mmread: nonconforming files that list
        # an entry twice must not leave repeated columns in a row (the
        # factorizations assign, not accumulate, per column)
        return HostCSR.from_coo(rows, cols, vals, shape,
                                sum_duplicates=True)
    with open(path, "r") as f:
        header = f.readline().strip().lower().split()
        if len(header) < 5 or header[0] != "%%matrixmarket":
            raise ValueError(f"{path}: not a MatrixMarket file")
        _, obj, fmt, field, symmetry = header[:5]
        if obj != "matrix" or fmt != "coordinate":
            raise NotImplementedError(f"{path}: only coordinate matrices supported")
        if field not in ("real", "integer", "double"):
            raise NotImplementedError(f"{path}: field {field!r} unsupported")
        # skip comments
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        n, m, nnz = (int(t) for t in line.split())
        body = np.loadtxt(f, dtype=np.float64, ndmin=2, max_rows=nnz)
    n_read = len(body) if body.size else 0
    if n_read != nnz:
        raise ValueError(f"{path}: truncated file — header promises "
                         f"{nnz} entries, found {n_read}")
    if body.size == 0:
        rows = np.empty(0, np.int64)
        cols = np.empty(0, np.int64)
        vals = np.empty(0, np.float64)
    else:
        rows = body[:, 0].astype(np.int64) - 1
        cols = body[:, 1].astype(np.int64) - 1
        vals = body[:, 2] if body.shape[1] > 2 else np.ones(len(rows))
    if symmetry in ("symmetric", "skew-symmetric"):
        off = rows != cols
        sign = -1.0 if symmetry == "skew-symmetric" else 1.0
        rows, cols, vals = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([vals, sign * vals[off]]),
        )
    elif symmetry != "general":
        raise NotImplementedError(f"{path}: symmetry {symmetry!r} unsupported")
    return HostCSR.from_coo(rows, cols, vals, (n, m), sum_duplicates=False)


def write_mtx(path: str, A: HostCSR, symmetry: str = "general") -> None:
    rows, cols, vals = A.to_coo()
    if symmetry == "symmetric":
        keep = rows >= cols
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate real {symmetry}\n")
        f.write(f"{A.shape[0]} {A.shape[1]} {len(rows)}\n")
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{r + 1} {c + 1} {v:.17g}\n")
