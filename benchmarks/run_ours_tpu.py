#!/usr/bin/env python
"""TPU-native solve benchmark: f32 kernels + f64 iterative refinement.

The BASELINE.md parity bar is a 1e-10 relative residual.  On TPU the fast
path is f32 (f64 is emulated); this runner solves each config with
mixed-precision iterative refinement (linear/refine.py): inner Krylov in
f32 on the Pallas/BWS kernels, outer residual correction in f64 on host.

Covers every measurable baseline config from BASELINE.md: PCG+IC,
GMRES+ILUT, PCG+AMG, AMG-V-cycle-as-solver (reference VCycleExample.py:
22-25) and the Bratu Newton problem (reference FDBratu2D.py:36-48).

Accounting: ``time_s = setup_s + solve_s``, both steady state:

* ``setup_s`` — the FULL setup re-run in the warm process (host RCM +
  geometry + pack streams, host incomplete factorization, and the fused
  one-dispatch device build, ops/fuse.py).  This is what every solve of
  a same-shaped system pays (e.g. each Newton step re-factoring the
  current Jacobian) once the process's jitted graphs are loaded.
* ``solve_s`` — steady-state solve (second call).

``setup_cold_s`` / ``time_cold_s`` report the process-first setup, which
additionally pays each setup graph's one-time trace+cache-load+program
upload through the tunnel — the setup-side analog of ``compile_s``
(excluded from time_s under the same convention: one-time, persistently
cached, no reference-side counterpart).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# module-level traced-state preconditioner applies: stable identity keys
# the cached inner jit, so re-built hierarchies reuse the compiled graph
def _amg_vcycle1(state, r):
    import jax.numpy as jnp
    from pysolvers_tpu.linear.amg import v_cycle
    return v_cycle(state, r, jnp.zeros_like(r))


def _amg_vcycle2(state, r):
    import jax.numpy as jnp
    from pysolvers_tpu.linear.amg import v_cycle
    x = jnp.zeros_like(r)
    for _ in range(2):
        x = v_cycle(state, r, x)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lev", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--configs", default="ic,amg,ilut,vcycle,bratu",
                    help="comma list: ic,amg,ilut,vcycle,bratu,ic_sweep,"
                         "ic_level")
    ap.add_argument("--bratu-m", type=int, default=100)
    ap.add_argument("--runs", type=int, default=1,
                    help="warm measurement repeats per config; the row "
                         "reports medians with *_min/*_max ranges "
                         "(VERDICT r2 item 10: no more prose caveats)")
    args = ap.parse_args()
    want = {t.strip() for t in args.configs.split(",") if t.strip()}
    known = {"ic", "amg", "ilut", "vcycle", "bratu", "ic_sweep",
             "ic_level"}
    bad = want - known
    if bad:
        # a typo must not silently skip a benchmark — the record set
        # would read as "covered" downstream
        raise SystemExit(f"unknown config(s) {sorted(bad)}; "
                         f"known: {sorted(known)}")

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/pst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import pysolvers_tpu as pst
    from pysolvers_tpu.linear.refine import ir_solve_host, ir_solve_dd
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

    def run(config, make_fn):
        """make_fn() -> {"solve": fn}; the FULL setup (pack + factor +
        fused device build) runs cold once (setup-graph loads included),
        then ``--runs`` warm (setup, solve) repeats — the row reports the
        MEDIAN with min/max ranges.  time_s = setup_s + solve_s."""
        import statistics
        t0 = time.perf_counter()
        make_fn()                  # cold: setup-graph loads included
        setup_cold_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = make_fn()          # warm: steady-state setup
        first_setup = time.perf_counter() - t0
        t0 = time.perf_counter()
        state["solve"]()           # compile + first solve
        compile_s = time.perf_counter() - t0
        setups, solves = [first_setup], []
        for rep in range(max(args.runs, 1)):
            if rep > 0:
                t0 = time.perf_counter()
                state = make_fn()
                setups.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            iters, err, ok = state["solve"]()
            solves.append(time.perf_counter() - t0)
        setup_s = statistics.median(setups)
        solve_s = statistics.median(solves)
        totals = [a + b for a, b in zip(setups, solves)]
        emit(dict(config=config,
                  time_s=round(setup_s + solve_s, 6),
                  time_s_min=round(min(totals), 6),
                  time_s_max=round(max(totals), 6),
                  runs=len(solves),
                  setup_s=round(setup_s, 6),
                  setup_cold_s=round(setup_cold_s, 6),
                  time_cold_s=round(setup_cold_s + solve_s, 6),
                  solve_s=round(solve_s, 6), iters=int(iters),
                  err=float(err), success=bool(ok),
                  compile_s=round(max(compile_s - solve_s, 0.0), 3)))

    # warm the device runtime first so the cold-setup numbers measure
    # setup-graph loads, not one-time backend/tunnel initialization
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    from pysolvers_tpu.ops.fuse import fused_build

    # the FIRST large program load of a process intermittently stalls on
    # the tunnel for tens of seconds (observed 20-465 s on whichever
    # config loads its ~3 MB fused-setup executable first, with the
    # compile cache HIT confirmed and identical later loads taking
    # 0.5-2 s; a small-graph warmup did NOT absorb it).  Warm up with a
    # problem-sized synthetic setup so the per-config setup_cold_s
    # measures the configs' own graph loads, not the first-big-load
    # roulette.
    t0 = time.perf_counter()
    _rng = np.random.default_rng(0)
    _nw = 16 * 1024
    _rw = np.repeat(np.arange(_nw), 3)
    _cw = np.clip(_rw + _rng.integers(-120, 121, len(_rw)), 0, _nw - 1)
    _Hw = pst.HostCSR.from_coo(
        np.concatenate([_rw, np.arange(_nw)]),
        np.concatenate([_cw, np.arange(_nw)]),
        np.concatenate([_rng.standard_normal(len(_rw)) * 0.01,
                        np.full(_nw, 4.0)]), (_nw, _nw))
    _Mw = ICPreconditionerType(1e-3, 15).prep(
        pst.HostCSR(_Hw.indptr, _Hw.indices,
                    _Hw.data.astype(np.float32), _Hw.shape))
    _items = [BwsMatrix.host_pack(_Hw, dtype=np.float32)[0]]
    if _Mw is not None:
        _items.append(_Mw[0])
    _wout = fused_build(_items)
    jax.block_until_ready(jax.tree_util.tree_leaves(_wout))
    # explicit device->host FETCH: the process's first transfer is the
    # roulette victim (20-660 s observed — it followed whichever call
    # fetched first: A32.perm before the host-perm fix, then the first
    # solve's result).  block_until_ready does not force a transfer on
    # this backend; a real fetch does.
    float(np.asarray(jax.tree_util.tree_leaves(_wout)[0]).ravel()[0])
    print(json.dumps({"warmup_fused_s":
                      round(time.perf_counter() - t0, 3)}), flush=True)

    def _perm_host(perm):
        Hp = H.permute_symmetric(perm)
        Hp32 = pst.HostCSR(Hp.indptr, Hp.indices,
                           Hp.data.astype(np.float32), Hp.shape)
        return Hp, Hp32

    _dbg = os.environ.get("PST_DEBUG_SETUP") == "1"
    _dd_on = os.environ.get("PST_DD_CHAIN", "1") != "0"

    def _mark(label, t0):
        if _dbg:
            print(f"    [setup] {label}: "
                  f"{time.perf_counter() - t0:.3f}s", flush=True)
        return time.perf_counter()

    def full_setup(prec_type=None):
        """H -> (A32 BWS pack, permuted host f64 matrix, preconditioner)
        through the fused one-dispatch setup — the factory mixed path's
        exact sequence (api._solve_mixed)."""
        t = time.perf_counter()
        item_A, asm_A, perm = BwsMatrix.host_pack(H, dtype=np.float32)
        t = _mark("host_pack", t)
        # start the operator blob upload NOW — the transfer overlaps the
        # host factorization below (ops/fuse.py stage_items; the factory
        # mixed path does the same)
        from pysolvers_tpu.ops.fuse import stage_items
        staged = stage_items([item_A])
        Hp, Hp32 = _perm_host(perm)
        t = _mark("perm_host", t)
        M = None
        if prec_type is not None:
            pp = prec_type.prep(Hp32)
            t = _mark("prep(factor)", t)
            if pp is not None:
                outs = fused_build([pp[0]], staged=staged)
                t = _mark("fused_build", t)
                A32 = asm_A(outs[0])
                M = pp[1](outs[1])
            else:
                (out_A,) = fused_build([], staged=staged)
                A32 = asm_A(out_A)
                M = prec_type.form(Hp32)
        else:
            (out_A,) = fused_build([], staged=staged)
            t = _mark("fused_build", t)
            A32 = asm_A(out_A)
        A64 = None
        if _dd_on:
            # f64 ELL copy for the dd-chain's in-graph residuals
            # (refine.ir_solve_dd); upload counted as setup
            A64 = pst.EllMatrix.from_host_csr(Hp, dtype=np.float64)
            t = _mark("A64_upload", t)
        jax.block_until_ready(A32.data)
        if A64 is not None:
            jax.block_until_ready(A64.data)
        if M is not None and M.traced is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(M.traced[1]))
        _mark("block_until_ready", t)
        return A32, Hp, M, perm, A64

    def _wrap_solve(A32, Hp, perm, method, restart=None, inner_maxiter=300,
                    precond_pair=None, prec_fn=None, A64=None,
                    overshoot=0.02):
        # perm stays HOST-side (host_pack returns it): fetching
        # A32.perm/iperm from the device costs a tunnel round trip that
        # intermittently stalls 20-660 s (measured; transfer-queue
        # roulette, the same pathology the fused warmup can't absorb)
        perm = np.asarray(perm)
        iperm = np.empty(len(perm), dtype=np.int64)
        iperm[perm] = np.arange(len(perm))
        bp = b_host[perm].astype(np.float64)
        # stable callables: the inner-solve jit is cached on identity
        # (refine._cached_inner*) — the traced precond_pair route keys on
        # the module-level apply_fn, so RE-FORMED preconditioners (the
        # warm setup pass) reuse the same compiled graph
        mv_hi = Hp.matvec

        def solve():
            if A64 is not None:
                # one-dispatch dd-chain: chain f64-residual corrections
                # in-graph (refine.ir_solve_dd) — the whole 1e-10 solve
                # usually costs ONE upload/dispatch/fetch round trip.
                # overshoot=0.005: drive the internal residual ~2 extra
                # decades past tau so the SOLUTION error is bounded
                # (err = ‖A⁻¹r‖ swings ~50× with the final residual's
                # direction) — costs 2-5 inner its at these rates;
                # hi_matvec auto-enables the f64 recurrence matvec for
                # these preconditioned solves (f64-grade counts).
                x, st, _ = ir_solve_dd(
                    mv_hi, bp, A_lo=A32, A64=A64,
                    tau=1e-10, inner_tau=1e-6,
                    inner_maxiter=inner_maxiter, method=method,
                    restart=restart, precond_pair=precond_pair,
                    precond_lo=prec_fn, chain=4, overshoot=overshoot)
            else:
                # chain=2: two f32-residual-chained corrections per
                # dispatch — halves the outer passes the tunnel pays for
                x, st, _ = ir_solve_host(
                    mv_hi, None, bp,
                    tau=1e-10, inner_tau=1e-6,
                    inner_maxiter=inner_maxiter,
                    method=method, restart=restart,
                    precond_lo=prec_fn, precond_pair=precond_pair,
                    host_residual=True, A_lo=A32, chain=2)
            xu = np.asarray(x)[iperm]
            err = np.linalg.norm(xu - x_exact)
            return int(st.k), err, int(st.reason) == 1

        return {"solve": solve}

    def _prec_kw(M):
        """traced route when the preconditioner state can ride as a jit
        argument (block plans); closure route otherwise — passing a None
        traced as precond_pair would silently solve UNPRECONDITIONED
        (the CPU fallback of this runner did exactly that: DH-13 IC ran
        484 iterations instead of ~24)."""
        if M.traced is not None:
            return dict(precond_pair=M.traced)
        return dict(prec_fn=M.apply_right)

    def pcg_ic():
        # default trisolve_mode="auto" → exact block-banded MXU solves
        A32, Hp, M, perm, A64 = full_setup(ICPreconditionerType(1e-3, 15))
        return _wrap_solve(A32, Hp, perm, "cg", inner_maxiter=600,
                           A64=A64, **_prec_kw(M))

    def pcg_ic_sweep():
        # approximate BWS Jacobi sweeps (pre-r2 default; comparison)
        A32, Hp, M, perm, A64 = full_setup(
            ICPreconditionerType(1e-3, 15, trisolve_mode="jacobi_bws"))
        return _wrap_solve(A32, Hp, perm, "cg", inner_maxiter=600,
                           prec_fn=M.apply_right, A64=A64)

    def pcg_ic_level():
        # exact level-scheduled trisolves (parity mode; XLA scalar
        # gathers make this the slow path on TPU)
        A32, Hp, M, perm, A64 = full_setup(
            ICPreconditionerType(1e-3, 15, trisolve_mode="level"))
        return _wrap_solve(A32, Hp, perm, "cg", prec_fn=M.apply_right,
                           A64=A64)

    def gmres_ilut():
        A32, Hp, M, perm, A64 = full_setup(ILUTPreconditionerType(1e-3, 15))
        return _wrap_solve(A32, Hp, perm, "gmres", restart=60,
                           A64=A64, **_prec_kw(M))

    def _amg_state(nu_pre=2, nu_post=2):
        # device-built construction products (smoothed P, R·A·P Galerkin,
        # coarse dense inverse all on the MXU — amg.py::
        # build_sa_hierarchy_device); only the O(nnz) aggregation runs on
        # host.  Fine level rides the BWS Pallas kernel (fine_format auto).
        from pysolvers_tpu.linear.amg import build_sa_hierarchy_device
        A32, Hp, _, perm, A64 = full_setup()
        hier = build_sa_hierarchy_device(Hp, num_levels=2,
                                         smoother="jacobi",
                                         nu_pre=nu_pre, nu_post=nu_post,
                                         dtype=np.float32)
        jax.block_until_ready(jax.tree_util.tree_leaves(hier))
        return A32, Hp, hier, perm, A64

    def pcg_amg():
        # SA-AMG V-cycle preconditioner (reference PCGExample_AMG.py:20-22
        # config: numIters=2, 2 levels); hierarchy on the permuted system.
        # The hierarchy pytree rides as the traced preconditioner state,
        # so the warm re-built hierarchy reuses the compiled inner graph.
        A32, Hp, hier, perm, A64 = _amg_state()
        return _wrap_solve(A32, Hp, perm, "cg", overshoot=0.005,
                           precond_pair=(_amg_vcycle2, hier), A64=A64)

    def vcycle_solver():
        # AMG V-cycle as a stationary SOLVER (reference VCycleExample.py:
        # 22-25: levels=2, nu1=nu2=2) — richardson iteration with one
        # V-cycle per step under f64 refinement.  Jacobi smoother: the
        # TPU-idiomatic choice (GS needs triangular solves; tolerances
        # still met — SURVEY §7.3)
        A32, Hp, hier, perm, A64 = _amg_state()
        return _wrap_solve(A32, Hp, perm, "richardson", inner_maxiter=100,
                           overshoot=0.005,
                           precond_pair=(_amg_vcycle1, hier), A64=A64)

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

        import statistics
        st, Fn = newton_once()          # compile + first solve
        solves = []
        for _ in range(max(args.runs, 1)):
            t0 = time.perf_counter()
            st, Fn = newton_once()      # steady state
            solves.append(time.perf_counter() - t0)
        solve_s = statistics.median(solves)
        emit(dict(config=f"Bratu{m}+Newton+PCG+AMG5(mixed)",
                  time_s=round(build_s + solve_s, 6),
                  time_s_min=round(build_s + min(solves), 6),
                  time_s_max=round(build_s + max(solves), 6),
                  runs=len(solves),
                  pack_s=round(build_s, 6), setup_s=0.0,
                  solve_s=round(solve_s, 6), iters=int(st.iters),
                  err=Fn, success=bool(st.success), compile_s=0.0))

    if "ic" in want:
        run(f"DH{lev}+PCG+IC(f32ir)", pcg_ic)
    if "amg" in want:
        run(f"DH{lev}+PCG+AMG(f32ir)", pcg_amg)
    if "ilut" in want:
        run(f"DH{lev}+GMRES+ILUT(f32ir)", gmres_ilut)
    if "vcycle" in want:
        run(f"DH{lev}+VCycleSolver(f32ir)", vcycle_solver)
    if "ic_sweep" in want:
        run(f"DH{lev}+PCG+ICsweep(f32ir)", pcg_ic_sweep)
    if "ic_level" in want:
        run(f"DH{lev}+PCG+IClevel(f32ir)", pcg_ic_level)
    if "bratu" in want:
        bratu()

    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
