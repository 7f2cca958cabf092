"""Persistent XLA compilation cache.

Compiles through this environment's remote TPU relay cost 20-340 s for the
full models; the persistent cache cuts warm starts to <1 s across processes
(measured). Every CLI and bench enables it by default; opt out with
``MDD_NO_COMPILE_CACHE=1`` or override the location with
``MDD_COMPILE_CACHE_DIR``.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotent; call before the first jit compilation."""
    if os.environ.get("MDD_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MDD_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/mdd_tpu_xla")
    )
    # per-platform subdirs: CPU AOT artifacts compiled elsewhere reload with
    # machine-feature mismatch warnings (and SIGILL risk) if shared
    platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or "default"
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
