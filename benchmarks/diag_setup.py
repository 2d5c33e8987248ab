#!/usr/bin/env python
"""Instrumented setup-phase breakdown for the TPU bench configs.

Answers: where do the DH-15 setup seconds go (host factor, host prep,
upload, device build, trace/lower, fetch)?  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python benchmarks/diag_setup.py --lev 15
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
    ap.add_argument("--lev", type=int, default=15)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/pst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import pysolvers_tpu as pst
    from pysolvers_tpu.linear.ilu import (ict_factor, ilut_factor,
                                          _check_fill)
    from pysolvers_tpu.sparse.bws import BwsMatrix
    from pysolvers_tpu.ops.trisolve import build_trisolve_plan

    T = {}

    def tic(name):
        T[name] = time.perf_counter()

    def toc(name):
        T[name] = round(time.perf_counter() - T[name], 4)
        print(f"  {name}: {T[name]}", flush=True)

    # warm the runtime
    tic("warmup_matmul")
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    toc("warmup_matmul")

    H, x_exact, b_host = pst.problems.dh_test_problem(args.lev)

    tic("bws_pack")
    A32 = BwsMatrix.from_host_csr(H, dtype=np.float32)
    jax.block_until_ready(A32.data)
    toc("bws_pack")

    rows, cols, vals = H.to_coo()
    iperm = np.asarray(A32.iperm)
    tic("perm_host")
    Hp = pst.HostCSR.from_coo(iperm[rows], iperm[cols], vals, H.shape)
    Hp32 = pst.HostCSR(Hp.indptr, Hp.indices, Hp.data.astype(np.float32),
                       Hp.shape)
    toc("perm_host")

    tic("ic_form_total")
    from pysolvers_tpu.linear.ilu import ICPreconditionerType
    M = ICPreconditionerType(1e-3, 15, trisolve_mode="block").form(Hp32)
    jax.block_until_ready(M.traced[1][0].s_hat)
    toc("ic_form_total")
    tic("ic_form_warm")
    M = ICPreconditionerType(1e-3, 15, trisolve_mode="block").form(Hp32)
    jax.block_until_ready(M.traced[1][0].s_hat)
    toc("ic_form_warm")

    tic("ilut_form_total")
    from pysolvers_tpu.linear.ilu import ILUTPreconditionerType
    Mi = ILUTPreconditionerType(1e-3, 15, trisolve_mode="block").form(Hp32)
    jax.block_until_ready(Mi.traced[1][0].s_hat)
    toc("ilut_form_total")
    tic("ilut_form_warm")
    Mi = ILUTPreconditionerType(1e-3, 15, trisolve_mode="block").form(Hp32)
    jax.block_until_ready(Mi.traced[1][0].s_hat)
    toc("ilut_form_warm")

    # --- solve phase: per-pass round-trip timing (IC config) ---
    from pysolvers_tpu.linear.refine import ir_solve_host
    perm = np.asarray(A32.perm)
    bp = b_host[perm].astype(np.float64)
    mv_hi = lambda v: Hp.matvec(v)
    prec = lambda v: M.apply_right(v)

    for label in ("solve_cold", "solve_warm", "solve_warm2"):
        tic(label)
        x, st, _ = ir_solve_host(mv_hi, None, bp, tau=1e-10,
                                 inner_tau=1e-6, inner_maxiter=600,
                                 method="cg", precond_lo=prec,
                                 host_residual=True, A_lo=A32, chain=2)
        toc(label)
    print(f"  ic iters={int(st.k)} reason={int(st.reason)}", flush=True)
    xu = np.asarray(x)[np.asarray(A32.iperm)]
    print(f"  ic err={np.linalg.norm(xu - x_exact):.2e}", flush=True)

    # --- AMG setup breakdown ---
    from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                          build_device_hierarchy)
    tic("sa_hierarchy_host")
    mlh = build_sa_hierarchy(Hp, num_levels=2)
    toc("sa_hierarchy_host")
    tic("device_hierarchy_bws")
    hier = build_device_hierarchy(mlh, smoother="jacobi", nu_pre=2,
                                  nu_post=2, dtype=np.float32,
                                  matrix_format="bws")
    jax.block_until_ready(jax.tree_util.tree_leaves(hier)[0])
    toc("device_hierarchy_bws")
    tic("device_hierarchy_bws2")
    hier = build_device_hierarchy(mlh, smoother="jacobi", nu_pre=2,
                                  nu_post=2, dtype=np.float32,
                                  matrix_format="bws")
    jax.block_until_ready(jax.tree_util.tree_leaves(hier)[0])
    toc("device_hierarchy_bws2")

    print(json.dumps(T), flush=True)


if __name__ == "__main__":
    main()
