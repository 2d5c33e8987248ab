#!/usr/bin/env python
"""Measure pysolvers_tpu on the BASELINE.md configurations.

Same JSON schema as run_reference.py: {config, time_s, iters, err, success}.
time_s includes preconditioner/hierarchy setup (as the reference's does) but
not jit compilation (compile is reported separately as compile_s — the
reference has no analogous cost; the persistent compile cache amortizes it
across runs).

Usage: python benchmarks/run_ours.py [--lev N] [--out FILE]
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
    ap.add_argument("--lev", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/pst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import pysolvers_tpu as pst

    results = []

    def run(config, setup_and_solve):
        # one throwaway call to compile, one timed call
        t0 = time.perf_counter()
        setup_and_solve()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters, err, success = setup_and_solve()
        dt = time.perf_counter() - t0
        rec = dict(config=config, time_s=round(dt, 6), iters=int(iters),
                   err=float(err), success=bool(success),
                   compile_s=round(compile_s, 3))
        results.append(rec)
        print(json.dumps(rec), flush=True)

    lev = args.lev
    H, x_exact, b_host = pst.problems.dh_test_problem(lev)

    def pcg_ic():
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=500, tau=1e-10),
                         precond=pst.RightIC()).make_solver()
        st = solver.solve(H, b_host)
        err = np.linalg.norm(np.asarray(st.soln) - x_exact)
        return st.iters, err, st.success

    def gmres_ilut():
        solver = pst.GMRES(pst.CommonSolverArgs(maxiter=500, tau=1e-10),
                           precond=pst.RightILUT()).make_solver()
        st = solver.solve(H, b_host)
        err = np.linalg.norm(np.asarray(st.soln) - x_exact)
        return st.iters, err, st.success

    def pcg_amg():
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=500, tau=1e-10),
                         precond=pst.AMG(num_iters=2, num_levels=2)
                         ).make_solver()
        st = solver.solve(H, b_host)
        err = np.linalg.norm(np.asarray(st.soln) - x_exact)
        return st.iters, err, st.success

    def vcycle():
        solver = pst.AMGVCycle(pst.CommonSolverArgs(maxiter=200, tau=1e-10),
                               num_levels=2).make_solver()
        st = solver.solve(H, b_host)
        err = np.linalg.norm(np.asarray(st.soln) - x_exact)
        return st.iters, err, st.success

    def cg_lap1d():
        H1 = pst.problems.fd_laplacian_1d(1000)
        x = np.random.default_rng(0).random(1000)
        b1 = H1.matvec(x)
        solver = pst.PCG(pst.CommonSolverArgs(maxiter=4000, tau=1e-10)
                         ).make_solver()
        st = solver.solve(H1, b1)
        err = np.linalg.norm(np.asarray(st.soln) - x)
        return st.iters, err, st.success

    run(f"DH{lev}+PCG+IC", pcg_ic)
    run(f"DH{lev}+GMRES+ILUT", gmres_ilut)
    run(f"DH{lev}+PCG+AMG2", pcg_amg)
    run(f"DH{lev}+VCycle", vcycle)
    run("Lap1D(1000)+CG", cg_lap1d)

    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
