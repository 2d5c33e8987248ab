#!/usr/bin/env python
"""Direct solve of a DH system (parity with reference
examples/DirectSolverExample.py)."""
import argparse

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import pysolvers_tpu as pst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshLev", type=int, default=10)
    from pysolvers_tpu.utils.platform import (add_platform_arg,
                                               enable_persistent_cache,
                                               ensure_platform)
    add_platform_arg(ap)
    args = ap.parse_args()
    ensure_platform(args.platform)
    enable_persistent_cache()
    A, x_exact, b = pst.problems.dh_test_problem(args.meshLev)
    st = pst.DefaultDirect().make_solver().solve(A, b)
    err = np.linalg.norm(np.asarray(st.soln) - x_exact)
    print(st)
    print(f"error norm = {err:.6e}")
    return 0 if st.success else 1


if __name__ == "__main__":
    raise SystemExit(main())
