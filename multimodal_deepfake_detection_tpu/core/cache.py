"""Persistent XLA compilation cache.

Compiles through this environment's remote TPU relay cost 20-340 s for the
full models; the persistent cache cuts warm starts to <1 s across processes
(measured). Every CLI and bench enables it by default; opt out with
``MDD_NO_COMPILE_CACHE=1`` or override the location with
``MDD_COMPILE_CACHE_DIR``.
"""
from __future__ import annotations

import hashlib
import os


def _machine_key() -> str:
    """Short hash of this host's CPU feature flags.

    CPU AOT artifacts are ISA-specific: reloading one compiled on a host with
    different vector extensions triggers ``cpu_aot_loader.cc`` feature-mismatch
    errors and risks SIGILL. Keying the cpu cache subdir on the flag set keeps
    warm starts on the same machine while making a copied/shared cache dir
    inert on any other.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform as _platform

    return hashlib.sha256(_platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotent; call before the first jit compilation."""
    if os.environ.get("MDD_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MDD_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/mdd_tpu_xla")
    )
    # per-platform subdirs: CPU AOT artifacts compiled elsewhere reload with
    # machine-feature mismatch warnings (and SIGILL risk) if shared; the cpu
    # subdir is additionally keyed on the host's CPU features (_machine_key)
    platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or "default"
    if platform in ("cpu", "default"):
        platform = f"{platform}-{_machine_key()}"
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
