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

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_mesh_globals():
    """make_mesh records the latest mesh in module globals (CURRENT_MESH /
    TP_ACTIVE) so pallas kernels can shard_map themselves; tests that build
    TP meshes must not leak that routing into unrelated tests."""
    from vqcpcb_tpu.parallel import mesh as mesh_lib
    saved = (mesh_lib.CURRENT_MESH, mesh_lib.TP_ACTIVE)
    mesh_lib.CURRENT_MESH, mesh_lib.TP_ACTIVE = None, False
    yield
    mesh_lib.CURRENT_MESH, mesh_lib.TP_ACTIVE = saved
