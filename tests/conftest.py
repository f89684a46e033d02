"""Test configuration.

By default the suite runs on CPU (Pallas interpret mode) with 8 virtual
devices so multi-chip sharding tests can build an 8-device mesh on any
machine — deterministic, hermetic, and independent of a flaky TPU tunnel.
Set ``JAX_PLATFORMS=tpu,cpu`` to run compiled kernels on an attached TPU;
tests marked ``@pytest.mark.onchip`` (compiled numerics over the full build
set, hardware-only behaviors) run ONLY in that mode and are skipped on CPU.
The CPU platform is always appended so the virtual 8-device mesh exists in
both modes. This must execute before the first ``import jax``.
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


def _tpu_attached() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _tpu_attached():
        return
    skip = pytest.mark.skip(
        reason="needs a real TPU: run with JAX_PLATFORMS=tpu,cpu")
    for item in items:
        if "onchip" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    """8 virtual CPU devices for sharding tests."""
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected >=8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
