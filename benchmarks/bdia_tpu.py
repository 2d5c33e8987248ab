#!/usr/bin/env python
"""BDIA (block-DIA / BSR-class) vs BWS SpMV throughput on a blocked
matrix (VERDICT r2 item 8 "Done" row).

Problem: vector 2-D Laplacian, b dofs/node (problems.fd_vector_
laplacian_2d) — dense b×b blocks on the 5-point stencil.  Both kernels
run the SAME operator; nnz/s counts the scalar nonzeros of the CSR.
Marginal-cost timing (chain-length difference) like bench.py.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import pysolvers_tpu as pst
    from pysolvers_tpu.sparse.bdia import BdiaMatrix
    from pysolvers_tpu.sparse.bws import BwsMatrix

    m, b = args.m, args.b
    H = pst.problems.fd_vector_laplacian_2d(m, b=b, coupling=0.2,
                                            dtype=np.float64)
    n, nnz = H.shape[0], H.nnz
    # bake a boundedness scale in so chained f32 iterates stay finite
    H.data *= 1.0 / (8.0 * (m + 1.0) ** 2)
    H32 = pst.HostCSR(H.indptr, H.indices, H.data.astype(np.float32),
                      H.shape)

    A_bdia = BdiaMatrix.from_host_csr(H32, b=b)
    A_bws = BwsMatrix.from_host_csr(H32, use_rcm=False, fast_select=True,
                                    group_rows=32, gt="auto")
    x = jnp.asarray(np.random.default_rng(0).random(n).astype(np.float32))

    def chain(A, iters):
        @jax.jit
        def fn(A, v):
            def body(_, v):
                return pst.matvec(A, v)
            return jax.lax.fori_loop(0, iters, body, v)
        return fn

    def rate(A, reps=4, n_short=50, n_long=250):
        cs, cl = chain(A, n_short), chain(A, n_long)
        _ = float(cs(A, x)[0])
        _ = float(cl(A, x)[0])

        def timed(fn, v):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                v = fn(A, v)
                _ = float(v[0])
                best = min(best, time.perf_counter() - t0)
            return best, v

        ts, y = timed(cs, x)
        tl, _ = timed(cl, y)
        per = max((tl - ts) / (n_long - n_short), 1e-9)
        return nnz / per

    r_bdia = rate(A_bdia)
    r_bws = rate(A_bws)
    rec = dict(metric="bdia_vs_bws_spmv", n=n, b=b, nnz=nnz,
               bdia_gnnzs=round(r_bdia / 1e9, 3),
               bws_gnnzs=round(r_bws / 1e9, 3),
               speedup=round(r_bdia / r_bws, 2),
               stored_ratio=round(A_bdia.nnz_stored / nnz, 2))
    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
