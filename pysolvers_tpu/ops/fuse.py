"""One-dispatch setup fusion for high-latency device links.

On a remote-attached TPU every distinct jitted graph pays a per-process
first-call cost (trace + lower + compile-cache load + program upload) and
every separate ``jnp.asarray`` upload pays a transfer-program load on its
first use of a shape/dtype.  Measured on the axon tunnel (DH-15): the BWS
pack's 7 stream uploads + scatter dispatch cost 0.51 s process-cold
against 0.06 s warm, almost all of it per-shape transfer programs.

This module collapses an arbitrary set of setup builds into

* ONE int32 blob upload  (all input arrays bit-packed host-side), and
* ONE jitted dispatch    (each build's device-side constructor runs on
  slices of the blob inside the same graph),

keyed on the builds' static signature so repeated setups of same-shaped
problems reuse the compiled graph.

The reference has no analog (scipy/SuperLU run in-process,
``ILUTPreconditioner.py:51-53``); this is the TPU-native answer to the
same setup phase when the device sits across a ~25 ms-RTT link.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class SetupItem(NamedTuple):
    """One deferred device build: ``build(arrays, statics) -> pytree``.

    ``build`` must be a module-level (stable-identity) traceable function;
    the fused jit is cached on ``(build, statics, array specs)``.
    """

    arrays: tuple
    build: Callable
    statics: tuple


def _to_words(a: np.ndarray):
    """Host array -> (int32 word view, kind, logical shape)."""
    a = np.ascontiguousarray(a)
    if a.dtype == np.float32:
        return a.view(np.int32).ravel(), "f32", a.shape
    if a.dtype == np.int32:
        return a.ravel(), "i32", a.shape
    if a.dtype == np.float64:
        if not jax.config.jax_enable_x64:
            # bitcast_convert_type silently truncates to f32 with x64
            # off, producing a cryptic shape error far from the cause
            raise ValueError(
                "fused_build received a float64 array but jax_enable_x64 "
                "is off — enable x64 or cast the array to float32")
        return a.view(np.int32).ravel(), "f64", a.shape
    if a.dtype == np.uint8:
        # widen host-side: lane-index streams are small and int32 keeps
        # the blob layout trivial
        return a.astype(np.int32).ravel(), "i32", a.shape
    if a.dtype == np.int64:
        if a.size and (np.abs(a) > 2 ** 31 - 1).any():
            raise ValueError("int64 array exceeds int32 range; blob "
                             "packing stores indices as int32")
        return a.astype(np.int32).ravel(), "i32", a.shape
    raise TypeError(f"unsupported blob dtype {a.dtype}")


def blob_pack(arrays: Sequence[np.ndarray]):
    """Pack host arrays into one int32 blob + static layout spec."""
    parts, specs, off = [], [], 0
    for a in arrays:
        w, kind, shape = _to_words(np.asarray(a))
        parts.append(w)
        specs.append((kind, tuple(int(s) for s in shape), off))
        off += len(w)
    blob = (np.concatenate(parts) if parts
            else np.zeros(0, dtype=np.int32))
    return blob, tuple(specs)


def blob_split(blob: jax.Array, specs):
    """Recover the original arrays from the blob (jit-traceable; static
    slicing only)."""
    out = []
    for kind, shape, off in specs:
        n = int(np.prod(shape)) if shape else 1
        if kind == "i32":
            x = blob[off:off + n]
        elif kind == "f32":
            x = jax.lax.bitcast_convert_type(blob[off:off + n],
                                             jnp.float32)
        elif kind == "f64":
            words = blob[off:off + 2 * n].reshape(n, 2)
            x = jax.lax.bitcast_convert_type(_f64_order(words),
                                             jnp.float64)
        else:  # pragma: no cover
            raise ValueError(kind)
        out.append(x.reshape(shape))
    return out


_F64_SWAP = None


def _f64_order(words):
    """Word order for the 2×int32 → f64 bitcast.

    numpy on a little-endian host stores the low word first; XLA's
    BitcastConvert composes the wide value with index 0 least-significant
    on LE backends.  Probed once (host-side, no device dispatch) and
    cached; swaps the pair if the convention ever differs.
    """
    global _F64_SWAP
    if _F64_SWAP is None:
        probe = np.array([1.5], dtype=np.float64).view(np.int32)
        with jax.ensure_compile_time_eval():
            val = np.asarray(jax.lax.bitcast_convert_type(
                jnp.asarray(probe.reshape(1, 2)), jnp.float64))
        _F64_SWAP = not bool(val[0] == 1.5)
    return words[:, ::-1] if _F64_SWAP else words


def passthrough_build(arrs, st):
    """Builder that just lands the arrays on device (upload-only items,
    e.g. smoother diagonals riding along a fused hierarchy build)."""
    return arrs[0] if len(arrs) == 1 else tuple(arrs)


_FUSE_CACHE: dict = {}


class StagedItems(NamedTuple):
    """Items whose blob is already in flight to the device (stage_items).

    The upload (jax.device_put is asynchronous) overlaps whatever host
    work runs between staging and the fused dispatch — e.g. the
    incomplete factorization, whose 0.1-0.2 s would otherwise serialize
    in front of the operator pack's transfer on the tunnel."""

    dev_blob: jax.Array
    layouts: tuple
    items: tuple


def stage_items(items: Sequence[SetupItem]) -> StagedItems:
    """Pack the items and START their blob upload now (asynchronously)."""
    blobs, layouts = [], []
    base = 0
    for it in items:
        b, specs = blob_pack(it.arrays)
        blobs.append(b)
        layouts.append(tuple((k, s, off + base) for k, s, off in specs))
        base += len(b)
    big = (np.concatenate(blobs) if blobs
           else np.zeros(0, dtype=np.int32))
    return StagedItems(jnp.asarray(big), tuple(layouts), tuple(items))


def fused_build(items: Sequence[SetupItem],
                staged: "StagedItems | None" = None):
    """Run every item's device build in ONE dispatch (plus the staged
    items' builds, if any — their blob upload already started).

    Returns the list of build outputs (device pytrees): staged items
    first, then ``items``, each in order.
    """
    blobs, layouts = [], []
    base = 0
    for it in items:
        b, specs = blob_pack(it.arrays)
        blobs.append(b)
        layouts.append(tuple((k, s, off + base) for k, s, off in specs))
        base += len(b)
    big = (np.concatenate(blobs) if blobs
           else np.zeros(0, dtype=np.int32))

    s_items = staged.items if staged is not None else ()
    s_lays = staged.layouts if staged is not None else ()
    key = (tuple((it.build, lay, it.statics)
                 for it, lay in zip(s_items, s_lays)),
           tuple((it.build, lay, it.statics)
                 for it, lay in zip(items, layouts)))
    fn = _FUSE_CACHE.get(key)
    if fn is None:
        s_builds = [it.build for it in s_items]
        s_statics = [it.statics for it in s_items]
        s_lays_l = list(s_lays)
        builds = [it.build for it in items]
        statics = [it.statics for it in items]
        lays = list(layouts)

        @jax.jit
        def fn(s_blob, blob):
            outs = [bld(blob_split(s_blob, lay), st)
                    for bld, lay, st in zip(s_builds, s_lays_l, s_statics)]
            outs += [bld(blob_split(blob, lay), st)
                     for bld, lay, st in zip(builds, lays, statics)]
            return tuple(outs)

        if len(_FUSE_CACHE) > 64:
            _FUSE_CACHE.pop(next(iter(_FUSE_CACHE)))
        _FUSE_CACHE[key] = fn
    s_blob = (staged.dev_blob if staged is not None
              else jnp.zeros(0, dtype=jnp.int32))
    return list(fn(s_blob, jnp.asarray(big)))
