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


def add_platform_arg(parser) -> None:
    parser.add_argument("--platform", default=None,
                        choices=["cpu", "tpu", "axon"],
                        help="force a JAX platform (cpu runs anywhere)")
