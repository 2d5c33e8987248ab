"""Platform selection helper for scripts.

This image's sitecustomize preimports jax and pins the accelerator
platform, so env vars can't switch backends; config updates can (until the
backend is initialized).  Call ``ensure_platform("cpu", n)`` FIRST in any
script that should run on the host.
"""
from __future__ import annotations


def ensure_platform(platform: str = None, cpu_devices: int = 0) -> None:
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
    if platform == "cpu" and cpu_devices:
        try:
            jax.config.update("jax_num_cpu_devices", cpu_devices)
        except Exception:
            pass


def enable_persistent_cache(path: str = "/tmp/pst_jax_cache") -> None:
    """Turn on JAX's persistent compilation cache with a zero
    min-compile-time threshold.

    The threshold matters on remote-compile backends: even a sub-second
    graph costs a ~0.5 s compiler round trip per process, so excluding
    "fast" compiles from the cache (the 1 s default) re-pays that on
    every run.  With the threshold at 0 a cached small graph dispatches
    in ~0.14 s (measured on the axon tunnel).
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def warmup_device() -> None:
    """Dispatch a tiny matmul AND fetch one scalar back.

    Initializes the backend and — crucially on remote-attached devices —
    exercises the process's first device->host transfer, which can stall
    tens to hundreds of seconds on a congested tunnel (measured 20-660 s;
    the stall attaches to whichever call fetches first).
    ``block_until_ready`` alone does not force a transfer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    y = jnp.ones((8, 128)) @ jnp.ones((128, 8))
    jax.block_until_ready(y)
    float(np.asarray(y).ravel()[0])


def add_platform_arg(parser) -> None:
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"],
                        help="force a JAX platform (cpu runs anywhere)")
