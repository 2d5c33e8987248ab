"""Checkpoint/resume for solver state and setup products.

The reference has no checkpointing (SURVEY §5); its only reuse mechanisms
are in-memory freeze flags.  For long-running production solves this module
adds durable state: any JAX pytree (solution iterates, Krylov bases, AMG
device hierarchies, factorization plans) round-trips through a single
``.npz`` file — no pickle, no external deps.

Static (aux) pytree structure is re-supplied by the caller via an example
tree, which keeps the format safe and forward-compatible.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save all array leaves of a pytree to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, n_leaves=np.int64(len(leaves)), **arrays)


def load_pytree(path: str, example: Any) -> Any:
    """Load leaves from ``path`` into the structure of ``example``.

    ``example`` supplies the treedef and any static metadata; its leaf
    values are ignored (shapes/dtypes are checked against the file).
    """
    data = np.load(path)
    n = int(data["n_leaves"])
    treedef = jax.tree_util.tree_structure(example)
    if treedef.num_leaves != n:
        raise ValueError(
            f"checkpoint has {n} leaves; example structure expects "
            f"{treedef.num_leaves}")
    ex_leaves = jax.tree_util.tree_leaves(example)
    leaves = []
    for i, ex in enumerate(ex_leaves):
        arr = data[f"leaf_{i}"]
        ex_arr = np.asarray(ex)
        if arr.shape != ex_arr.shape:
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != expected "
                f"{ex_arr.shape}")
        if arr.dtype != ex_arr.dtype:
            # the docstring promises dtype checking — a silent
            # f64->f32 cast would truncate resumed solver state by
            # ~8 digits with no indication
            raise ValueError(
                f"leaf {i}: checkpoint dtype {arr.dtype} != expected "
                f"{ex_arr.dtype}")
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_solve_state(path: str, x, resid_history=None, iters: int = 0
                     ) -> None:
    """Convenience: persist a solve-in-progress (restart vector + log)."""
    np.savez(path, x=np.asarray(x),
             resid_history=(np.asarray(resid_history)
                            if resid_history is not None else np.zeros(0)),
             iters=np.int64(iters))


def load_solve_state(path: str):
    d = np.load(path)
    return (jax.numpy.asarray(d["x"]), d["resid_history"], int(d["iters"]))
