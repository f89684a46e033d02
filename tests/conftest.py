"""Test configuration.

Default (``JAX_PLATFORMS`` unset): run on the attached TPU when one is
registered — tests marked ``@pytest.mark.onchip`` (compiled numerics over
the full build set, hardware-only behaviors) then run too. Set
``JAX_PLATFORMS=cpu`` for a genuinely hermetic CPU run (Pallas interpret
mode; onchip tests are skipped) — deterministic and independent of a
flaky TPU tunnel. On a tunneled (axon) box the TPU backend registers at
interpreter start via sitecustomize and plugin registration BYPASSES
``JAX_PLATFORMS`` filtering, so requesting cpu re-execs the process
without the registration trigger. The CPU platform is always appended so
the 8-virtual-device mesh for the sharding suites exists in every mode.
This must execute before the first ``import jax``.

Fast hermetic lane: ``JAX_PLATFORMS=cpu pytest -m "not slow"`` completes a
COLD run (empty compile cache) in under ~15 minutes on one CPU host; the
``slow`` marker carries the dozen heaviest interpret-mode tests (measured
round 5, cold: the unmarked suite was 24:46, the marked-out tests carry
~10 minutes of it). The full suite remains the merge gate.
"""

import os
import sys

platforms = os.environ.get("JAX_PLATFORMS", "")
_cpu_only = bool(platforms) and set(platforms.split(",")) == {"cpu"}
_needs_cpu_reexec = _cpu_only and bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
if platforms and "cpu" not in platforms.split(","):
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
# FA_TPU_TEST_CACHE overrides the location — point it at an empty dir to
# measure a genuinely cold run (CI-cost estimation) without clobbering the
# warm cache other tools share.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FA_TPU_TEST_CACHE", "/tmp/fa_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_configure(config):
    if not _needs_cpu_reexec:
        return
    # The axon sitecustomize registered the tunneled TPU backend before any
    # conftest ran, and plugin registration bypasses JAX_PLATFORMS=cpu —
    # computations would silently go to the chip. Re-exec without the
    # registration trigger for a genuinely hermetic CPU run (the condition
    # is false post-exec, so this happens exactly once). Capture must be
    # released first or the child inherits a captured stdout fd.
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *config.invocation_params.args],
              env)


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
