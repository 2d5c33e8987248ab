#!/usr/bin/env python
"""Beyond-one-chip scale demonstration (VERDICT r2 item 6).

Per-device memory model (f32 DIA + CG state):
    bytes/device ≈ (D + V) · 4 · n / d
with D diagonals (5 for the 2-D Laplacian) and V ≈ 6 slab vectors
(x, r, p, Ap + b + scratch), i.e. ~44 B/row at D=5.  One v5e chip
(16 GB HBM) therefore tops out near n ≈ 3.6·10^8; anything larger MUST
shard.  This harness demonstrates:

  virtual   n=4·10^8 (working set ≈ 17.6 GB — does NOT fit one chip)
            sharded over the 8-device virtual mesh: distributed CG
            steps + correctness vs an analytic host matvec, recording
            actual per-device buffer bytes;
  ell50m    n≈5·10^7 on the neighbor-halo ELL path (the vector is never
            replicated — the layout that makes >HBM problems possible);
  chip      single real TPU chip at the largest n the model admits:
            upload, run CG iterations, record throughput + bytes.

The 2-D Laplacian's diagonals are built ANALYTICALLY (no CSR
intermediate — a 4·10^8-row CSR would need ~20 GB of host index arrays
for nothing; the DIA table is the natural assembly target at this
scale).
"""
import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ceil_to(x, m):
    return ((x + m - 1) // m) * m


def analytic_lap2d_diags(m: int, n_pad: int, dtype=np.float32):
    """(5, n_pad) DIA table + offsets of the SPD 2-D FD Laplacian on an
    m×m interior grid (values of problems.fd_laplacian_2d, assembled
    straight into diagonal storage)."""
    n = m * m
    s = dtype((m + 1.0) ** 2)
    diags = np.zeros((5, n_pad), dtype=dtype)
    offsets = (-m, -1, 0, 1, m)
    diags[2, :n] = 4.0 * s
    # east (off +1): absent at j = m-1; the table holds A[i, i+off]
    east = np.full(n, -s, dtype=dtype)
    east[m - 1::m] = 0.0
    diags[3, :n] = east
    west = np.full(n, -s, dtype=dtype)
    west[0::m] = 0.0
    diags[1, :n] = west
    diags[4, :n - m] = -s          # south neighbors (off +m)
    diags[0, m:n] = -s             # north (off -m): zero for i < m
    return diags, offsets


def host_matvec_diags(diags, offsets, n, x):
    y = np.zeros(n, dtype=np.float64)
    for d, off in enumerate(offsets):
        lo = max(0, -off)
        hi = min(n, n - off)
        y[lo:hi] += diags[d, lo:hi].astype(np.float64) * x[lo + off: hi + off]
    return y


def run_virtual(args, emit):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    from pysolvers_tpu.parallel import make_mesh, dist_dia_spmv
    from pysolvers_tpu.parallel.mesh import ROW_AXIS, row_sharding
    from pysolvers_tpu.parallel.spmv import ShardedDia
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = args.devices
    m = args.m_virtual
    n = m * m
    slab = _ceil_to(max((n + d - 1) // d, m, 8), 8)
    n_pad = slab * d
    t0 = time.perf_counter()
    diags, offsets = analytic_lap2d_diags(m, n_pad)
    build_s = time.perf_counter() - t0
    mesh = make_mesh(d)
    dd = jax.device_put(jnp.asarray(diags),
                        NamedSharding(mesh, P(None, ROW_AXIS)))
    A = ShardedDia(dd, offsets, (n, n), mesh)
    rng = np.random.default_rng(0)
    xh = rng.random(n_pad).astype(np.float32)
    xh[n:] = 0.0
    x = jax.device_put(jnp.asarray(xh), row_sharding(mesh))

    # correctness vs analytic host matvec on a slice (full host f64
    # matvec at n=4e8 is cheap numpy)
    # the operator rides as a traced ARGUMENT: closing over it bakes the
    # multi-GB table into the HLO as a constant (observed 3.9 GB shipped
    # to the remote compiler — it wedged for 30+ minutes)
    mv = jax.jit(lambda A, v: dist_dia_spmv(A, v))
    y = np.asarray(mv(A, x))[:n]
    yref = host_matvec_diags(diags, offsets, n, xh[:n].astype(np.float64))
    rel = float(np.linalg.norm(y - yref) / np.linalg.norm(yref))

    # actual per-device bytes
    shard_bytes = sum(s.data.nbytes for s in dd.addressable_shards
                      if s.device == jax.devices()[0])
    vec_bytes = x.addressable_shards[0].data.nbytes

    # a few distributed CG steps (psum dots via GSPMD)
    from pysolvers_tpu.linear.krylov import cg_solve
    b = mv(A, x)
    t0 = time.perf_counter()
    xs, st, _ = jax.jit(lambda A, b: cg_solve(
        lambda v: dist_dia_spmv(A, v), b, maxiter=args.cg_iters,
        tau=1e-30))(A, b)
    jax.block_until_ready(xs)
    cg_s = time.perf_counter() - t0
    emit(dict(config="virtual_mesh_dia", n=n, devices=d,
              matvec_rel_err=rel,
              matrix_bytes_per_device=shard_bytes,
              vector_bytes_per_device=vec_bytes,
              working_set_gb_total=round(
                  (5 + 6) * 4 * n / 1e9, 2),
              cg_iters=int(st.k), cg_resid=float(st.resid),
              cg_s=round(cg_s, 2), build_s=round(build_s, 2)))


def run_ell50m(args, emit):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    import pysolvers_tpu as pst
    from pysolvers_tpu.parallel import (make_mesh, shard_ell_halo,
                                        dist_ell_halo_spmv,
                                        pad_vector_ell_halo)

    m = args.m_ell
    n = m * m
    H = pst.problems.fd_laplacian_2d(m, dtype=np.float32)
    mesh = make_mesh(args.devices)
    A = shard_ell_halo(H, mesh)
    rng = np.random.default_rng(0)
    xh = rng.random(n).astype(np.float32)
    x = pad_vector_ell_halo(A, xh)
    y = np.asarray(jax.jit(lambda A, v: dist_ell_halo_spmv(A, v))(A, x))[:n]
    yref = H.matvec(xh.astype(np.float64))
    rel = float(np.linalg.norm(y - yref) / np.linalg.norm(yref))
    db = (A.data.addressable_shards[0].data.nbytes
          + A.lcols.addressable_shards[0].data.nbytes)
    emit(dict(config="virtual_mesh_ell_halo", n=n, devices=args.devices,
              matvec_rel_err=rel, matrix_bytes_per_device=int(db)))


def run_chip(args, emit):
    import jax
    import jax.numpy as jnp

    m = args.m_chip
    n = m * m
    n_pad = _ceil_to(n, 8)
    t0 = time.perf_counter()
    diags, offsets = analytic_lap2d_diags(m, n_pad)
    build_s = time.perf_counter() - t0
    print(f"[chip] built diags ({diags.nbytes/1e9:.1f} GB) in "
          f"{build_s:.1f}s", flush=True)
    from pysolvers_tpu.sparse.device import DiaMatrix
    t0 = time.perf_counter()
    A = DiaMatrix(jnp.asarray(diags), offsets, (n, n))
    jax.block_until_ready(A.diags)
    upload_s = time.perf_counter() - t0
    print(f"[chip] uploaded in {upload_s:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    xh = rng.random(n).astype(np.float32)
    x = jnp.asarray(xh)

    from pysolvers_tpu.ops import matvec
    # correctness spot-check; A as a traced argument (see run_virtual)
    mv = jax.jit(lambda A, v: matvec(A, v))
    y = np.asarray(mv(A, x))
    print("[chip] first matvec + fetch done", flush=True)
    yref = host_matvec_diags(diags, offsets, n, xh.astype(np.float64))
    rel = float(np.linalg.norm(y - yref) / np.linalg.norm(yref))
    print(f"[chip] correctness rel={rel:.2e}", flush=True)

    from pysolvers_tpu.linear.krylov import cg_solve
    b = mv(A, x)
    t0 = time.perf_counter()
    xs, st, _ = jax.jit(lambda A, b: cg_solve(
        lambda v: matvec(A, v), b, maxiter=args.cg_iters, tau=1e-30))(A, b)
    jax.block_until_ready(xs)
    cg_s = time.perf_counter() - t0
    print(f"[chip] CG done in {cg_s:.1f}s", flush=True)
    nnz = 5 * n - 4 * m            # interior stencil nnz (approx exact)
    emit(dict(config="single_chip_dia", n=n,
              matrix_gb=round(diags.nbytes / 1e9, 2),
              working_set_gb=round((diags.nbytes + 6 * 4 * n) / 1e9, 2),
              matvec_rel_err=rel, cg_iters=int(st.k),
              cg_resid=float(st.resid), cg_s=round(cg_s, 2),
              gnnz_s=round(nnz * int(st.k) / cg_s / 1e9, 1),
              build_s=round(build_s, 2), upload_s=round(upload_s, 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["virtual", "ell50m", "chip"],
                    required=True)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--m-virtual", type=int, default=20000)   # n = 4e8
    ap.add_argument("--m-ell", type=int, default=7072)        # n ≈ 5e7
    ap.add_argument("--m-chip", type=int, default=16000)      # n = 2.56e8
    ap.add_argument("--cg-iters", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = []

    def emit(rec):
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if args.side == "virtual":
        run_virtual(args, emit)
    elif args.side == "ell50m":
        run_ell50m(args, emit)
    else:
        run_chip(args, emit)

    if args.out:
        with open(args.out, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
