"""Test configuration.

Numerics tests run on the real TPU when one is attached (honoring the
environment's ``JAX_PLATFORMS``); the CPU platform is always added as a
secondary backend with 8 virtual devices so multi-chip sharding tests can
build an 8-device mesh on any machine. On CPU-only machines everything runs
in Pallas interpret mode. This must execute before the first ``import jax``.
"""

import os

platforms = os.environ.get("JAX_PLATFORMS", "")
if not platforms:
    os.environ["JAX_PLATFORMS"] = "cpu"
elif "cpu" not in platforms.split(","):
    os.environ["JAX_PLATFORMS"] = platforms + ",cpu"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: both Mosaic kernel compiles and the large
# XLA programs that interpret-mode Pallas lowers to dominate test time.
jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    """8 virtual CPU devices for sharding tests."""
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected >=8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
