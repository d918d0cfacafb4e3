"""Test config: force the CPU platform with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4: pjit sharding exercised via
xla_force_host_platform_device_count).

Note: this image registers a TPU PJRT plugin at interpreter startup via
sitecustomize, so JAX_PLATFORMS env alone is not enough — the jax config must
be updated before any backend is resolved.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
