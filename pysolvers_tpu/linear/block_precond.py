"""Block preconditioners for block-structured (BdiaMatrix) operators.

The reference preconditions every operator through the same
``PreconditionerType.form(A)`` factory (PySolvers/Linear/
PreconditionerType.py:4-11, consumed at PCGSolver.py:92-94); this module
extends that contract to the planar block-DIA format so BSR-class
operators are first-class solver citizens, not bare kernels.

Planar-native by design: both preconditioners below apply entirely in the
kernel's dof-major layout — no per-application transposes (a full-vector
transpose costs ~8x on a bandwidth-bound TPU kernel; sparse/bdia.py
module docstring).

* ``BlockJacobiBdiaPreconditionerType`` — M = blockdiag(D_i); the D_i are
  inverted ON DEVICE with a batched Gauss-Jordan (no jnp.linalg custom
  calls — portable across TPU runtimes, same policy as linear/amg.py's
  coarse inverse), stored as (b, b, nb) planes, applied as one einsum.
* ``BlockChebyshevBdiaPreconditionerType`` — degree-k Chebyshev on the
  block-Jacobi-preconditioned operator: the strong matvec-only option
  (each application = k BDIA Pallas matvecs + k block solves).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.bdia import BdiaMatrix
from .preconditioner import Preconditioner, PreconditionerType


def batched_inverse(Bs: jax.Array, ridge: float = 0.0) -> jax.Array:
    """Invert a batch of small dense blocks (nb, b, b) by Gauss-Jordan
    without pivoting (exact for the SPD/diagonally-dominant diagonal
    blocks this feeds on; ``ridge`` adds r·I first for safety)."""
    nb, b, _ = Bs.shape
    eye = jnp.eye(b, dtype=Bs.dtype)
    if ridge:
        Bs = Bs + ridge * eye
    M = jnp.concatenate([Bs, jnp.broadcast_to(eye, Bs.shape)], axis=-1)

    # b is a small static block size — unroll (static slices; a fori_loop
    # would need dynamic-slice plumbing for no win at b <= ~16)
    for j in range(b):
        piv_row = M[:, j, :]                           # (nb, 2b)
        pj = piv_row[:, j:j + 1]
        pj = jnp.where(pj == 0, jnp.ones_like(pj), pj)  # singular guard
        piv_row = piv_row / pj
        M = M - M[:, :, j:j + 1] * piv_row[:, None, :]
        M = M.at[:, j, :].set(piv_row)
    return M[:, :, b:]


def _block_apply(Binv_pl: jax.Array, v: jax.Array) -> jax.Array:
    """y = blockdiag(D_i)^{-1} v in planar layout.  Binv_pl is
    (b, b, nb) with Binv_pl[p, q, i] = (D_i^{-1})[p, q]; v is planar
    (b·nb,) or (b·nb, k)."""
    b, _, nb = Binv_pl.shape
    B = Binv_pl.astype(v.dtype)
    if v.ndim == 1:
        return jnp.einsum("pqi,qi->pi", B,
                          v.reshape(b, nb)).reshape(b * nb)
    k = v.shape[1]
    return jnp.einsum("pqi,qik->pik", B,
                      v.reshape(b, nb, k)).reshape(b * nb, k)


def block_jacobi_bdia_matrix(A: BdiaMatrix) -> BdiaMatrix:
    """blockdiag(D_i)^{-1} AS a BdiaMatrix (offsets=(0,)).

    The lockstep tiles path applies block-Jacobi through the same Pallas
    SpMM kernel as the operator: the jnp einsum form of the apply runs at
    ~12 GB/s on TPU (15 ms/iteration at n=2.1M, k=8 — XLA picks a
    dot_general layout the VPU can't stream), while the D=1 block-DIA
    kernel is HBM-bandwidth-bound like every other plane kernel."""
    Binv = batched_inverse(A.diag_blocks())           # (nb, b, b)
    # planes[q, p, i] = (D_i^{-1})[p, q]  (BdiaMatrix plane convention)
    planes = jnp.transpose(Binv, (2, 1, 0)).astype(A.dtype)
    nb_pad = A.nb_pad
    if planes.shape[-1] != nb_pad:
        planes = jnp.pad(planes,
                         ((0, 0), (0, 0), (0, nb_pad - planes.shape[-1])))
    return BdiaMatrix(planes=planes, offsets=(0,), shape=A.shape, b=A.b)


class BlockJacobiBdiaPreconditionerType(PreconditionerType):
    """M = blockdiag(D_i) for a BdiaMatrix — the planar-native analog of
    point Jacobi; setup is one device dispatch (batched Gauss-Jordan)."""

    def __init__(self, side: str = "right"):
        self.side = side

    def form(self, A_host=None, A_dev: BdiaMatrix = None) -> Preconditioner:
        A = A_dev if isinstance(A_dev, BdiaMatrix) else A_host
        if not isinstance(A, BdiaMatrix):
            raise ValueError("BlockJacobiBdiaPreconditionerType needs a "
                             "BdiaMatrix")
        D = A.diag_blocks()                            # (nb, b, b)
        Binv = batched_inverse(D)                      # (nb, b, b)
        Binv_pl = Binv.transpose(1, 2, 0)              # (b[p], b[q], nb)
        prec = self._wrap(lambda v: _block_apply(Binv_pl, v))
        prec.traced = (_block_apply, Binv_pl)
        return prec


class BlockChebyshevBdiaPreconditionerType(PreconditionerType):
    """Degree-k Chebyshev polynomial on the block-Jacobi-scaled operator
    B^{-1}A over [lmax/eig_ratio, lmax] — matvec-only (the BDIA Pallas
    kernel does all the work), planar-native, jittable."""

    def __init__(self, degree: int = 3, eig_ratio: float = 30.0,
                 side: str = "right", power_iters: int = 15):
        self.degree = degree
        self.eig_ratio = eig_ratio
        self.side = side
        self.power_iters = power_iters

    def form(self, A_host=None, A_dev: BdiaMatrix = None) -> Preconditioner:
        A = A_dev if isinstance(A_dev, BdiaMatrix) else A_host
        if not isinstance(A, BdiaMatrix):
            raise ValueError("BlockChebyshevBdiaPreconditionerType needs "
                             "a BdiaMatrix")
        Binv_pl = batched_inverse(A.diag_blocks()).transpose(1, 2, 0)
        # power iteration for lmax(B^{-1}A) — host loop of device matvecs
        # (setup phase, a dozen dispatches)
        from ..ops import matvec
        rng = np.random.default_rng(42)
        v = jnp.asarray(rng.random(A.shape[0]), dtype=A.dtype)
        lam = 1.0
        for _ in range(self.power_iters):
            w = _block_apply(Binv_pl, matvec(A, v))
            lam = float(jnp.linalg.norm(w))
            if lam == 0:
                lam = 1.0
                break
            v = w / lam
        lmax = lam * 1.05
        lmin = lmax / self.eig_ratio
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        degree = self.degree

        def apply(r):
            z = jnp.zeros_like(r)
            p = _block_apply(Binv_pl, r) / theta
            z = z + p
            rho = delta / theta
            for _ in range(degree - 1):
                res = _block_apply(Binv_pl, r - matvec(A, z))
                rho_new = 1.0 / (2.0 * theta / delta - rho)
                p = rho_new * rho * p + (2.0 * rho_new / delta) * res
                z = z + p
                rho = rho_new
            return z

        return self._wrap(apply)
