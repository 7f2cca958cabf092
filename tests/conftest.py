"""Test harness config: run everything on CPU with an 8-device virtual mesh.

The container's ``sitecustomize`` pre-imports jax with ``JAX_PLATFORMS=axon``
(the real TPU tunnel), so plain env vars are not enough — we must override via
``jax.config`` before the first backend-initializing call. Tests then exercise
multi-chip sharding on 8 virtual CPU devices (SURVEY.md §4). Set
``MDD_TEST_ON_TPU=1`` to run the suite against the real chip instead.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("MDD_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
