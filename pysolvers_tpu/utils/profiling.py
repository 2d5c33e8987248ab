"""Profiling and performance accounting.

Replaces the reference's wall-clock-only Timer instrumentation (SURVEY §5)
with TPU-grade observability:

* ``trace(...)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory.
* ``SpeedOfLight`` — per-chip roofline model: given a kernel's bytes/flops,
  report achieved fraction of HBM bandwidth / peak FLOPs.  Chip table holds
  the TPU generations this framework targets.
* ``measure(fn, *args)`` — robust wall-clock of a jitted callable with
  block_until_ready, warmup, and min-over-repeats.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float          # HBM bandwidth, GB/s
    f32_tflops: float        # peak dense f32 TFLOP/s (MXU)
    bf16_tflops: float
    vmem_mb: float


CHIPS = {
    "v4": ChipSpec("v4", 1228.0, 137.5, 275.0, 16.0),
    "v5e": ChipSpec("v5e", 819.0, 98.0, 197.0, 16.0),
    "v5p": ChipSpec("v5p", 2765.0, 229.5, 459.0, 16.0),
    "v6e": ChipSpec("v6e", 1640.0, 459.0, 918.0, 16.0),
}


def current_chip() -> ChipSpec:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return CHIPS["v5e"]
    for key, spec in CHIPS.items():
        if key in kind.replace(" ", "").replace("tpu", ""):
            return spec
    return CHIPS["v5e"]


@dataclasses.dataclass
class SpeedOfLight:
    """Roofline accounting for one kernel invocation."""

    bytes_moved: float
    flops: float = 0.0
    chip: Optional[ChipSpec] = None

    def bound(self) -> str:
        c = self.chip or current_chip()
        t_mem = self.bytes_moved / (c.hbm_gbps * 1e9)
        t_flop = self.flops / (c.f32_tflops * 1e12)
        return "memory" if t_mem >= t_flop else "compute"

    def sol_seconds(self) -> float:
        c = self.chip or current_chip()
        return max(self.bytes_moved / (c.hbm_gbps * 1e9),
                   self.flops / (c.f32_tflops * 1e12))

    def achieved_fraction(self, measured_s: float) -> float:
        return self.sol_seconds() / measured_s if measured_s > 0 else 0.0


def measure(fn: Callable, *args, warmup: int = 2, repeats: int = 20,
            inner: int = 5) -> float:
    """Best-of wall-clock seconds per call of a jitted fn."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pst_trace"):
    """jax.profiler trace context (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def spmv_sol(nnz: int, n: int, fmt: str, dtype_bytes: int = 4,
             n_diags: int = 0) -> SpeedOfLight:
    """Speed-of-light model for one SpMV by storage format."""
    if fmt == "dia":
        bytes_moved = (n_diags * n + 2 * n) * dtype_bytes
    elif fmt == "ell":
        bytes_moved = nnz * (dtype_bytes + 4) + 2 * n * dtype_bytes
    else:  # csr
        bytes_moved = nnz * (dtype_bytes + 4) + (3 * n) * dtype_bytes
    return SpeedOfLight(bytes_moved=float(bytes_moved), flops=2.0 * nnz)
