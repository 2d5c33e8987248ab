#!/usr/bin/env python
"""Device probe: do int16 loads + astype(int32) work inside a Pallas
kernel on this backend?

Round-1 finding: int8 lane indices (load + astype(int32) before the lane
gather) produced WRONG RESULTS on the real TPU while interpret mode was
correct, so BWS keeps int32 indices.  int16 was never tested — if it
works, the BWS lidx array halves (the format is memory-bound, so ~15%
bandwidth win on the unstructured SpMV).  Run on the real chip:

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_idx16.py
"""
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    x = rng.random((8, 128)).astype(np.float32)
    idx = rng.integers(0, 128, size=(8, 128)).astype(np.int16)

    def kernel(idx_ref, x_ref, o_ref):
        with jax.enable_x64(False):
            ii = idx_ref[...].astype(jnp.int32)
            o_ref[...] = jnp.take_along_axis(x_ref[...], ii, axis=1)

    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(idx), jnp.asarray(x))
    want = np.take_along_axis(x, idx.astype(np.int64), axis=1)
    err = float(np.abs(np.asarray(out) - want).max())
    ok = err == 0.0
    print(f"int16 lane-index gather: {'OK' if ok else 'WRONG'} "
          f"(max err {err})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
