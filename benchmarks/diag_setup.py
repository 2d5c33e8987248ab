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


def fine(args):
    """--fine: split the IC/ILUT critical path into host work vs
    first-dispatch graph loads (each distinct jitted graph pays a
    per-process load through the tunnel even on a warm persistent
    cache)."""
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/pst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import pysolvers_tpu as pst
    from pysolvers_tpu.sparse import bws as bws_mod
    from pysolvers_tpu.sparse.bws import BwsMatrix
    from pysolvers_tpu.linear.ilu import (ict_factor, ilut_factor,
                                          ILUTPreconditionerType,
                                          ICPreconditionerType)

    T = {}

    def tic():
        return time.perf_counter()

    def rec(name, t0):
        T[name] = round(time.perf_counter() - t0, 4)
        print(f"  {name}: {T[name]}", flush=True)

    t0 = tic()
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    rec("warmup_matmul", t0)

    H, x_exact, b_host = pst.problems.dh_test_problem(args.lev)

    # --- pack breakdown: time the fused blob dispatch separately ---
    from pysolvers_tpu.ops import fuse as fuse_mod
    orig_fused = fuse_mod.fused_build
    fused_times = []

    def timed_fused(items):
        t = tic()
        out = orig_fused(items)
        jax.block_until_ready(out)
        fused_times.append(round(time.perf_counter() - t, 4))
        return out

    # (bws/block_trisolve import fused_build from the fuse module at call
    # time, so patching the module attribute intercepts their dispatches)
    fuse_mod.fused_build = timed_fused
    t0 = tic()
    p = BwsMatrix._rcm_perm(H)
    rec("sym_rcm", t0)
    t0 = tic()
    gr, gt = bws_mod._auto_geometry(H, p, False)
    rec("auto_geometry", t0)
    t0 = tic()
    A32 = BwsMatrix.from_host_csr(H, dtype=np.float32, group_rows=gr,
                                  gt=gt, _perm=p)
    jax.block_until_ready(A32.data)
    rec("pack_given_geom", t0)
    t0 = tic()
    A32b = BwsMatrix.from_host_csr(H, dtype=np.float32, group_rows=gr,
                                   gt=gt, _perm=p)
    jax.block_until_ready(A32b.data)
    rec("pack_given_geom_warm", t0)
    if fused_times:
        T["fused_dispatch_1st"] = fused_times[0]
        T["fused_dispatch_2nd"] = fused_times[-1]
    fuse_mod.fused_build = orig_fused

    # --- permuted host matrix ---
    t0 = tic()
    rows, cols, vals = H.to_coo()
    iperm = np.asarray(A32.iperm)
    Hp = pst.HostCSR.from_coo(iperm[rows], iperm[cols], vals, H.shape)
    Hp32 = pst.HostCSR(Hp.indptr, Hp.indices, Hp.data.astype(np.float32),
                       Hp.shape)
    rec("perm_host", t0)

    # --- IC: factor vs plan-pair dispatch ---
    t0 = tic()
    Lic = ict_factor(Hp32, 1e-3 * 0.1, 15)
    rec("ic_factor_host", t0)
    from pysolvers_tpu.ops.block_trisolve import (
        build_block_trisolve_plan_pair)
    t0 = tic()
    pl = build_block_trisolve_plan_pair(Lic, Lic.transpose(),
                                        unit_lo=False, unit_up=False,
                                        dtype=np.float32)
    jax.block_until_ready(pl[0].s_hat)
    rec("ic_plan_pair_1st", t0)
    t0 = tic()
    pl = build_block_trisolve_plan_pair(Lic, Lic.transpose(),
                                        unit_lo=False, unit_up=False,
                                        dtype=np.float32)
    jax.block_until_ready(pl[0].s_hat)
    rec("ic_plan_pair_2nd", t0)

    # --- ILUT: factor vs plan-pair dispatch ---
    t0 = tic()
    L, U = ilut_factor(Hp32, 1e-3 * 0.1, 15)
    rec("ilut_factor_host", t0)
    t0 = tic()
    pr = build_block_trisolve_plan_pair(L, U, unit_lo=True, unit_up=False,
                                        dtype=np.float32)
    jax.block_until_ready(pr[0].s_hat)
    rec("ilut_plan_pair_1st", t0)
    t0 = tic()
    pr = build_block_trisolve_plan_pair(L, U, unit_lo=True, unit_up=False,
                                        dtype=np.float32)
    jax.block_until_ready(pr[0].s_hat)
    rec("ilut_plan_pair_2nd", t0)

    # --- full form() calls for cross-check ---
    t0 = tic()
    M = ICPreconditionerType(1e-3, 15, trisolve_mode="block").form(Hp32)
    jax.block_until_ready(M.traced[1][0].s_hat)
    rec("ic_form_after_warm", t0)
    t0 = tic()
    Mi = ILUTPreconditionerType(1e-3, 15, trisolve_mode="block").form(Hp32)
    jax.block_until_ready(Mi.traced[1][0].s_hat)
    rec("ilut_form_after_warm", t0)

    # --- AMG hierarchy (fused device build) ---
    from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                          build_device_hierarchy)
    t0 = tic()
    mlh = build_sa_hierarchy(Hp, num_levels=2)
    rec("sa_host", t0)
    for label in ("hier_1st", "hier_2nd", "hier_3rd"):
        t0 = tic()
        hier = build_device_hierarchy(mlh, smoother="jacobi", nu_pre=2,
                                      nu_post=2, dtype=np.float32,
                                      matrix_format="bws")
        jax.block_until_ready(jax.tree_util.tree_leaves(hier))
        rec(label, t0)

    print(json.dumps(T), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lev", type=int, default=15)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--fine", action="store_true",
                    help="host-vs-dispatch breakdown of the IC/ILUT path")
    args = ap.parse_args()
    if args.fine:
        fine(args)
        return

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
    jax.block_until_ready(jax.tree_util.tree_leaves(hier))
    toc("device_hierarchy_bws")
    tic("device_hierarchy_bws2")
    hier = build_device_hierarchy(mlh, smoother="jacobi", nu_pre=2,
                                  nu_post=2, dtype=np.float32,
                                  matrix_format="bws")
    jax.block_until_ready(jax.tree_util.tree_leaves(hier))
    toc("device_hierarchy_bws2")

    print(json.dumps(T), flush=True)


if __name__ == "__main__":
    main()
