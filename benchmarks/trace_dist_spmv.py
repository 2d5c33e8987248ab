#!/usr/bin/env python
"""Profile one distributed SpMV chain (VERDICT r2 item 5): commit a
jax.profiler trace showing where ppermute sits relative to local compute.

Writes a TensorBoard-loadable trace under --out (default
benchmarks/our_results/trace_dist_spmv/) plus a small JSON summary of
the op-level timings extracted from the trace (the part a reviewer can
read without TensorBoard).
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-devices", type=int, default=8)
    ap.add_argument("--rows-per-shard", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "our_results", "trace_dist_spmv"))
    args = ap.parse_args()

    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax.numpy as jnp
    import numpy as np
    import math
    import pysolvers_tpu as pst
    from pysolvers_tpu.parallel import (make_mesh, shard_dia,
                                        dist_dia_spmv, pad_vector_dia)

    d = len(jax.devices())
    m = int(math.isqrt(args.rows_per_shard * d))
    H = pst.problems.fd_laplacian_2d(m, dtype=np.float32)
    mesh = make_mesh(d)
    A = shard_dia(H, mesh)
    x = pad_vector_dia(
        A, np.random.default_rng(0).random(m * m).astype(np.float32))
    scale = np.float32(1.0 / (8.0 * (m + 1.0) ** 2))
    iters = args.iters

    @jax.jit
    def chain(A, v):
        def body(_, v):
            return dist_dia_spmv(A, v) * scale
        return jax.lax.fori_loop(0, iters, body, v)

    jax.block_until_ready(chain(A, x))        # compile outside the trace
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        jax.block_until_ready(chain(A, x))

    # summarize: pull op durations from the trace's trace.json.gz
    summary = dict(devices=d, n=m * m, iters=iters, ops={})
    for path in glob.glob(os.path.join(
            args.out, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(path, "rt") as f:
            tr = json.load(f)
        for ev in tr.get("traceEvents", []):
            name = ev.get("name", "")
            dur = ev.get("dur", 0)
            if not dur:
                continue
            for tag in ("ppermute", "collective-permute", "fusion",
                        "dynamic-slice", "copy", "while"):
                if tag in name.lower():
                    o = summary["ops"].setdefault(
                        tag, dict(count=0, total_us=0.0))
                    o["count"] += 1
                    o["total_us"] = round(o["total_us"] + dur, 1)
                    break
    out_json = os.path.join(args.out, "summary.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
