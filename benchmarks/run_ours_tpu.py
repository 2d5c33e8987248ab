#!/usr/bin/env python
"""TPU-native solve benchmark: f32 kernels + f64 iterative refinement.

The BASELINE.md parity bar is a 1e-10 relative residual.  On TPU the fast
path is f32 (f64 is emulated); this runner solves each config with
mixed-precision iterative refinement (linear/refine.py): inner Krylov in
f32 on the Pallas/BWS kernels, outer residual correction in f64.

Same JSON schema as run_reference.py.
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
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/pst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import pysolvers_tpu as pst
    from pysolvers_tpu.linear.refine import ir_solve_host
    from pysolvers_tpu.linear.ilu import (ILUTPreconditionerType,
                                          ICPreconditionerType)
    from pysolvers_tpu.sparse.bws import BwsMatrix
    from pysolvers_tpu.ops.bws_spmv import bws_spmv

    lev = args.lev
    H, x_exact, b_host = pst.problems.dh_test_problem(lev)
    n = H.shape[0]
    b = jnp.asarray(b_host)

    results = []

    def run(config, make_fn):
        """make_fn() -> (setup_fn, solve_fn); setup products are passed to
        solve_fn.  Reports setup_s, steady-state solve_s (second call:
        compile cached), and time_s = setup_s + solve_s."""
        t0 = time.perf_counter()
        state = make_fn()          # host setup (factor, pack, transfer)
        setup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state["solve"]()           # compile + first solve
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters, err, ok = state["solve"]()
        solve_s = time.perf_counter() - t0
        rec = dict(config=config, time_s=round(setup_s + solve_s, 6),
                   setup_s=round(setup_s, 6), solve_s=round(solve_s, 6),
                   iters=int(iters), err=float(err), success=bool(ok),
                   compile_s=round(max(compile_s - solve_s, 0.0), 3))
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # device matrix: BWS f32 (outer f64 residuals run on host — an
    # emulated-f64 sparse matvec on TPU hits the scalar gather path)
    A32 = BwsMatrix.from_host_csr(H, dtype=np.float32)
    mv32 = lambda v: bws_spmv(A32, v)  # operates in RCM-permuted order
    perm = np.asarray(A32.perm)
    H_perm = None

    def make_perm_host():
        nonlocal H_perm
        if H_perm is None:
            rows, cols, vals = H.to_coo()
            iperm = np.asarray(A32.iperm)
            H_perm = pst.HostCSR.from_coo(iperm[rows], iperm[cols], vals,
                                          H.shape)
        return H_perm

    def _f32(Hm):
        return pst.HostCSR(Hm.indptr, Hm.indices,
                           Hm.data.astype(np.float32), Hm.shape)

    def _wrap_solve(M, method, restart=None, inner_maxiter=300):
        Hp = make_perm_host()
        bp = b_host[perm].astype(np.float64)
        # stable callables: the inner-solve jit is cached on their
        # identity (refine._cached_inner) — fresh lambdas per call would
        # retrace the Pallas-heavy graph every solve (~10 s vs ~0.25 s)
        mv_hi = lambda v: Hp.matvec(v)
        prec = lambda v: M.apply_right(v)

        def solve():
            x, st, _ = ir_solve_host(
                mv_hi, mv32, bp,
                tau=1e-10, inner_tau=1e-6, inner_maxiter=inner_maxiter,
                method=method, restart=restart,
                precond_lo=prec,
                host_residual=True)
            xu = np.asarray(x)[np.asarray(A32.iperm)]
            err = np.linalg.norm(xu - x_exact)
            return int(st.k), err, int(st.reason) == 1

        return {"solve": solve}

    def pcg_ic():
        # default trisolve_mode="auto" → BWS Jacobi sweeps on TPU
        Hp = make_perm_host()
        M = ICPreconditionerType(1e-3, 15).form(_f32(Hp))
        return _wrap_solve(M, "cg", inner_maxiter=600)

    def pcg_ic_level():
        # exact level-scheduled trisolves (parity mode; XLA scalar
        # gathers make this the slow path on TPU)
        Hp = make_perm_host()
        M = ICPreconditionerType(1e-3, 15,
                                 trisolve_mode="level").form(_f32(Hp))
        return _wrap_solve(M, "cg")

    def gmres_ilut():
        Hp = make_perm_host()
        M = ILUTPreconditionerType(1e-3, 15).form(_f32(Hp))
        return _wrap_solve(M, "gmres", restart=60)

    def pcg_amg():
        # SA-AMG V-cycle preconditioner (reference PCGExample_AMG.py:20-22
        # config: numIters=2, 2 levels); hierarchy on the permuted system
        from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                              build_device_hierarchy,
                                              v_cycle)
        Hp = make_perm_host()
        mlh = build_sa_hierarchy(Hp, num_levels=2)
        hier = build_device_hierarchy(mlh, smoother="jacobi", nu_pre=2,
                                      nu_post=2, dtype=np.float32,
                                      matrix_format="bws")

        class _M:
            @staticmethod
            def apply_right(r):
                x = jnp.zeros_like(r)
                for _ in range(2):
                    x = v_cycle(hier, r, x)
                return x

        return _wrap_solve(_M, "cg")

    run(f"DH{lev}+PCG+IC(f32ir)", pcg_ic)
    run(f"DH{lev}+PCG+AMG(f32ir)", pcg_amg)
    run(f"DH{lev}+PCG+IClevel(f32ir)", pcg_ic_level)
    run(f"DH{lev}+GMRES+ILUT(f32ir)", gmres_ilut)

    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
