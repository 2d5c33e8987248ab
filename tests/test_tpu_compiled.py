"""Compiled-on-TPU equality checks for Mosaic-specific kernel paths.

The suite pins interpret-mode bit-equality for the windowed BWS source
vector (test_bws.py::TestWindowedX), but the constructs that differ on
real hardware — pltpu.roll with a dynamic shift, BlockSpec index maps
dividing a prefetched base — only exercise their Mosaic lowering when
COMPILED on a TPU backend (ADVICE r4).  These tests spawn a subprocess
on the real chip (the in-process suite is latched to the CPU platform)
and skip cleanly when no TPU is attached.
"""
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import numpy as np
import jax
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU")
    raise SystemExit(0)
import jax.numpy as jnp
from pysolvers_tpu.ops import bws_spmv as mod
from pysolvers_tpu.sparse.bws import BwsMatrix
from pysolvers_tpu.problems import dh_test_problem

H, _, _ = dh_test_problem(12)
A = BwsMatrix.from_host_csr(H, dtype=np.float32, group_rows=32, gt=32)
assert len(A.s_classes) >= 2
x = jnp.asarray(np.random.default_rng(3).random(H.shape[0])
                .astype(np.float32))
y_res = np.asarray(mod.bws_spmv(A, x, interpret=False))
mod.X2_RESIDENT_BYTES = 0            # force the windowed fetch path
y_win = np.asarray(mod.bws_spmv(A, x, interpret=False))
np.testing.assert_array_equal(y_win, y_res)
# sanity vs the host product (bws_matvec handles the pack permutation;
# f32 accumulation tolerance)
y_mv = np.asarray(mod.bws_matvec(A, x, interpret=False))
y_ref = H.matvec(np.asarray(x, dtype=np.float64))
rel = np.abs(y_mv - y_ref).max() / np.abs(y_ref).max()
assert rel < 1e-5, rel
print("OK")
"""


def _have_tpu_env():
    # the remote-TPU tunnel registers through this env var in this image;
    # without it the subprocess would only ever see CPU
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


@pytest.mark.skipif(not _have_tpu_env(), reason="no TPU tunnel configured")
def test_windowed_bws_compiled_on_tpu():
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pst_jax_cache")
    try:
        r = subprocess.run([sys.executable, "-c", _SCRIPT],
                           capture_output=True, text=True, timeout=420,
                           env=env)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU tunnel unresponsive")
    if "NO_TPU" in r.stdout:
        pytest.skip("no TPU backend available in subprocess")
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    assert "OK" in r.stdout


_SCRIPT_BDIA_F64 = r"""
import numpy as np
import jax
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU")
    raise SystemExit(0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from pysolvers_tpu.sparse.bdia import BdiaMatrix
from pysolvers_tpu.ops.spmv import bdia_spmm_rows
from pysolvers_tpu.problems import fd_vector_laplacian_2d

# regression: the f64 XLA fallback's original transpose->scatter->slice
# graph MISCOMPILED on the axon backend when compiled as one jit unit
# (wrong values, no error); the scatter-before-transpose form is pinned
# here against the host oracle, compiled on the real chip.
H = fd_vector_laplacian_2d(30, b=5, coupling=0.2, dtype=np.float64)
A = BdiaMatrix.from_host_csr(H, 5)
rng = np.random.default_rng(0)
V = rng.random((4, H.shape[0]))
ref = np.stack([A.host_matvec_planar(V[j]) for j in range(4)])
out = np.asarray(jax.jit(lambda v: bdia_spmm_rows(A, v))(jnp.asarray(V)))
rel = np.abs(out - ref).max() / np.abs(ref).max()
assert rel < 1e-12, rel
# and inside a fori_loop (the solver-loop shape of the same graph)
@jax.jit
def chain(V):
    def body(_, V):
        Y = bdia_spmm_rows(A, V)
        return Y / jnp.max(jnp.abs(Y))
    return jax.lax.fori_loop(0, 3, body, V)
out = np.asarray(chain(jnp.asarray(V)))
Vh = V.copy()
for _ in range(3):
    Y = np.stack([A.host_matvec_planar(Vh[j]) for j in range(4)])
    Vh = Y / np.abs(Y).max()
assert np.abs(out - Vh).max() < 1e-12
print("OK")
"""


@pytest.mark.skipif(not _have_tpu_env(), reason="no TPU tunnel configured")
def test_bdia_f64_rows_fallback_compiled_on_tpu():
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pst_jax_cache")
    try:
        r = subprocess.run([sys.executable, "-c", _SCRIPT_BDIA_F64],
                           capture_output=True, text=True, timeout=420,
                           env=env)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU tunnel unresponsive")
    if "NO_TPU" in r.stdout:
        pytest.skip("no TPU backend available in subprocess")
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    assert "OK" in r.stdout
