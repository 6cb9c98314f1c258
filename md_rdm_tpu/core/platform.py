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


def enable_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Turn on jax's persistent compilation cache (idempotent, best
    effort).  A cold full-model compile through the remote-TPU relay runs
    10-20 minutes; the cache turns every later run's compile into a disk
    read.  Directory: ``cache_dir`` arg > ``MDRDM_COMPILE_CACHE`` env >
    ``~/.cache/md_rdm_tpu/jax_cache``."""
    import os
    cache_dir = (cache_dir
                 or os.environ.get("MDRDM_COMPILE_CACHE")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "md_rdm_tpu", "jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
