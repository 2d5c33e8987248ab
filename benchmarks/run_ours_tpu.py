#!/usr/bin/env python
"""TPU-native solve benchmark: f32 kernels + f64 iterative refinement.

The BASELINE.md parity bar is a 1e-10 relative residual.  On TPU the fast
path is f32 (f64 is emulated); this runner solves each config with
mixed-precision iterative refinement (linear/refine.py): inner Krylov in
f32 on the Pallas/BWS kernels, outer residual correction in f64 on host.

Covers every measurable baseline config from BASELINE.md: PCG+IC,
GMRES+ILUT, PCG+AMG, AMG-V-cycle-as-solver (reference VCycleExample.py:
22-25) and the Bratu Newton problem (reference FDBratu2D.py:36-48).

Accounting: ``time_s = pack_s + setup_s + solve_s`` where pack_s is the
device-matrix pack+upload (shared across configs in this process but
charged to each config, as a standalone run would pay it), setup_s is
preconditioner/hierarchy setup, and solve_s is the steady-state solve
(second call; jit compile excluded — one-time cost, persistently cached).
Same JSON schema as run_reference.py plus the extra fields.
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
    ap.add_argument("--configs", default="ic,amg,ilut,vcycle,bratu",
                    help="comma list: ic,amg,ilut,vcycle,bratu,ic_sweep,"
                         "ic_level")
    ap.add_argument("--bratu-m", type=int, default=100)
    args = ap.parse_args()
    want = set(args.configs.split(","))

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/pst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
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

    results = []

    def emit(rec):
        results.append(rec)
        print(json.dumps(rec), flush=True)

    def run(config, make_fn, pack_s=0.0):
        """make_fn() -> {"solve": fn}; reports pack_s (device matrix),
        setup_s (preconditioner), steady-state solve_s (second call), and
        time_s = pack_s + setup_s + solve_s."""
        t0 = time.perf_counter()
        state = make_fn()          # host setup (factor, pack, transfer)
        setup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state["solve"]()           # compile + first solve
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters, err, ok = state["solve"]()
        solve_s = time.perf_counter() - t0
        emit(dict(config=config,
                  time_s=round(pack_s + setup_s + solve_s, 6),
                  pack_s=round(pack_s, 6), setup_s=round(setup_s, 6),
                  solve_s=round(solve_s, 6), iters=int(iters),
                  err=float(err), success=bool(ok),
                  compile_s=round(max(compile_s - solve_s, 0.0), 3)))

    # warm the device runtime first so pack_s measures the pack+upload,
    # not the one-time backend/tunnel initialization
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    # device matrix: BWS f32 (outer f64 residuals run on host — an
    # emulated-f64 sparse matvec on TPU hits the scalar gather path)
    t0 = time.perf_counter()
    A32 = BwsMatrix.from_host_csr(H, dtype=np.float32)
    jax.block_until_ready(A32.data)
    pack_s = time.perf_counter() - t0
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

    def _wrap_solve(M, method, restart=None, inner_maxiter=300,
                    prec_fn=None):
        Hp = make_perm_host()
        bp = b_host[perm].astype(np.float64)
        # stable callables: the inner-solve jit is cached on their
        # identity (refine._cached_inner) — fresh lambdas per call would
        # retrace the Pallas-heavy graph every solve (~10 s vs ~0.25 s)
        mv_hi = lambda v: Hp.matvec(v)
        prec = prec_fn if prec_fn is not None else \
            (lambda v: M.apply_right(v))

        def solve():
            # chain=2: two f32-residual-chained corrections per dispatch
            # — halves the outer passes a remote tunnel pays for
            x, st, _ = ir_solve_host(
                mv_hi, None, bp,
                tau=1e-10, inner_tau=1e-6, inner_maxiter=inner_maxiter,
                method=method, restart=restart,
                precond_lo=prec,
                host_residual=True, A_lo=A32, chain=2)
            xu = np.asarray(x)[np.asarray(A32.iperm)]
            err = np.linalg.norm(xu - x_exact)
            return int(st.k), err, int(st.reason) == 1

        return {"solve": solve}

    def pcg_ic():
        # default trisolve_mode="auto" → exact block-banded MXU solves
        Hp = make_perm_host()
        M = ICPreconditionerType(1e-3, 15).form(_f32(Hp))
        return _wrap_solve(M, "cg", inner_maxiter=600)

    def pcg_ic_sweep():
        # approximate BWS Jacobi sweeps (pre-r2 default; comparison)
        Hp = make_perm_host()
        M = ICPreconditionerType(1e-3, 15,
                                 trisolve_mode="jacobi_bws").form(_f32(Hp))
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

    def _amg_hier(nu_pre=2, nu_post=2):
        from pysolvers_tpu.linear.amg import (build_sa_hierarchy,
                                              build_device_hierarchy)
        Hp = make_perm_host()
        mlh = build_sa_hierarchy(Hp, num_levels=2)
        return build_device_hierarchy(mlh, smoother="jacobi",
                                      nu_pre=nu_pre, nu_post=nu_post,
                                      dtype=np.float32,
                                      matrix_format="bws")

    def pcg_amg():
        # SA-AMG V-cycle preconditioner (reference PCGExample_AMG.py:20-22
        # config: numIters=2, 2 levels); hierarchy on the permuted system
        from pysolvers_tpu.linear.amg import v_cycle
        hier = _amg_hier()

        def prec(r):
            x = jnp.zeros_like(r)
            for _ in range(2):
                x = v_cycle(hier, r, x)
            return x

        return _wrap_solve(None, "cg", prec_fn=prec)

    def vcycle_solver():
        # AMG V-cycle as a stationary SOLVER (reference VCycleExample.py:
        # 22-25: levels=2, nu1=nu2=2) — richardson iteration with one
        # V-cycle per step under f64 refinement.  Jacobi smoother: the
        # TPU-idiomatic choice (GS needs triangular solves; tolerances
        # still met — SURVEY §7.3)
        from pysolvers_tpu.linear.amg import v_cycle
        hier = _amg_hier()

        def prec(r):
            return v_cycle(hier, r, jnp.zeros_like(r))

        return _wrap_solve(None, "richardson", prec_fn=prec,
                           inner_maxiter=100)

    def bratu():
        # reference FDBratu2D.py:36-48: Newton + PCG+AMG(numIters=5),
        # tau=1e-12, m=100, minLinTol=1e-6, freezePrec — via the
        # mixed-precision factory route (f64 outer on host, f32 inner on
        # the DIA kernel)
        from pysolvers_tpu import (CommonSolverArgs, NewtonSolver, PCG,
                                   SolverConfig)
        from pysolvers_tpu.linear.amg import AMG
        from pysolvers_tpu.problems import Bratu2D
        from pysolvers_tpu.problems.bratu import Bratu2DHostOuter

        m = args.bratu_m
        t0 = time.perf_counter()
        # host-outer adapter: f64 F/line-search on host (no per-step
        # device dispatch; true f64 on any backend), device DIA inner
        prob = Bratu2DHostOuter(Bratu2D(m=m, alpha=0.5, fmt="dia"))
        build_s = time.perf_counter() - t0

        def newton_once():
            inner = PCG(CommonSolverArgs(maxiter=400, tau=1e-12),
                        precond=AMG(num_iters=5, num_levels=2),
                        precision="mixed")
            ns = NewtonSolver(SolverConfig(maxiter=30, tau=1e-12),
                              solver=inner, min_lin_tol=1e-6,
                              freeze_prec=True)
            # longdouble iterate: the f64 x-quantization floor sits at
            # ~1e-11 for m=100, right at the tau=1e-12 target
            st = ns.solve(prob, np.zeros(prob.n, dtype=np.longdouble))
            Fn = float(np.linalg.norm(
                prob.evalF(np.asarray(st.soln, dtype=np.float64))))
            return st, Fn

        st, Fn = newton_once()          # compile + first solve
        t0 = time.perf_counter()
        st, Fn = newton_once()          # steady state
        solve_s = time.perf_counter() - t0
        emit(dict(config=f"Bratu{m}+Newton+PCG+AMG5(mixed)",
                  time_s=round(build_s + solve_s, 6),
                  pack_s=round(build_s, 6), setup_s=0.0,
                  solve_s=round(solve_s, 6), iters=int(st.iters),
                  err=Fn, success=bool(st.success), compile_s=0.0))

    if "ic" in want:
        run(f"DH{lev}+PCG+IC(f32ir)", pcg_ic, pack_s)
    if "amg" in want:
        run(f"DH{lev}+PCG+AMG(f32ir)", pcg_amg, pack_s)
    if "ilut" in want:
        run(f"DH{lev}+GMRES+ILUT(f32ir)", gmres_ilut, pack_s)
    if "vcycle" in want:
        run(f"DH{lev}+VCycleSolver(f32ir)", vcycle_solver, pack_s)
    if "ic_sweep" in want:
        run(f"DH{lev}+PCG+ICsweep(f32ir)", pcg_ic_sweep, pack_s)
    if "ic_level" in want:
        run(f"DH{lev}+PCG+IClevel(f32ir)", pcg_ic_level, pack_s)
    if "bratu" in want:
        bratu()

    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
