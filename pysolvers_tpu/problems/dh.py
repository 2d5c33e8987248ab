"""Debye-Hückel FEM test-matrix family loader.

Capability parity with the reference's examples/DHTestProblem.py:6-36:
loads TestMatrices/DH-Matrix-<lev>.mtx and manufactures a solution
(random exact x, b = A·x) for convergence testing.
"""
from __future__ import annotations

import os

import numpy as np

from ..sparse.host import HostCSR
from ..sparse.io import read_mtx

_DEFAULT_DIR = os.environ.get(
    "PST_TEST_MATRICES", "/root/reference/TestMatrices")


def dh_test_problem(lev: int, matrix_dir: str = None, seed: int = 0):
    """Return (A, x_exact, b) for DH mesh level ``lev`` (0..15).

    The reference accepts lev 0..16 (DHTestProblem.py:21) but level 16 is
    absent from the repository (.MISSING_LARGE_BLOBS); we accept 0..15.
    """
    if not (0 <= lev <= 15):
        # the reference accepts 16 but the file was stripped from its
        # repo — fail here with the reason, not a FileNotFoundError later
        raise ValueError(f"DH mesh level must be in [0, 15], got {lev} "
                         "(level 16 is absent from the reference's "
                         "TestMatrices)")
    d = matrix_dir or _DEFAULT_DIR
    path = os.path.join(d, f"DH-Matrix-{lev}.mtx")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    A = read_mtx(path)
    rng = np.random.default_rng(seed)
    x = rng.random(A.shape[0])
    b = A.matvec(x)
    return A, x, b
