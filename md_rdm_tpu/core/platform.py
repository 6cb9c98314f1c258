"""Backend selection helper.

This container's sitecustomize registers the axon TPU backend at interpreter
startup and pins ``JAX_PLATFORMS=axon``, so neither env vars nor os.environ
edits can select the CPU backend - only a live ``jax.config.update`` works.
"""
from __future__ import annotations

from typing import Optional


def select_platform(platform: Optional[str], host_devices: int = 0) -> None:
    """Force the jax platform ('cpu'/'tpu'/None=default).  Call before any
    jax computation.  ``host_devices`` > 0 also requests that many virtual
    CPU devices (only effective before backend initialization)."""
    if host_devices:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={host_devices}"
            ).strip()
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
