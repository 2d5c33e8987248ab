"""Pallas gather-based SpMV for unstructured matrices.

Status: this Mosaic/XLA build rejects sublane-axis dynamic gather (internal
compiler error for every probed shape), and lane-axis ``take_along_axis`` is
limited to 128 lanes.  The planned fast path is a block-window SELL kernel:
rows grouped so each group's columns fall in aligned 128-wide blocks (after
RCM reordering), block rows of x selected via an MXU one-hot matmul, entries
picked with the supported 128-lane gather, products reduced with static
reshapes.  Until that lands, `pallas_supported` returns False and dispatch
falls back to the XLA gather path in ``spmv.ell_spmv_xla``.
"""
from __future__ import annotations


def pallas_supported(A) -> bool:
    return False


def ell_spmv_pallas(A, x):
    raise NotImplementedError("block-window SELL kernel not yet enabled")
