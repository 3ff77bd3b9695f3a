"""Test environment: 8 virtual CPU devices, before jax initializes.

Multi-device tests run on a simulated 8-device CPU mesh (SURVEY §4.4);
the driver separately dry-run-compiles the multi-chip path via
__graft_entry__.dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment's sitecustomize pins jax_platforms to the TPU backend at
# interpreter start; override it AFTER import, before backend init
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules that drive the 8-virtual-device mesh hard (sharded train steps,
# GSPMD inference, scan-fused multi-step programs). Under host contention
# (e.g. a concurrent TPU training process on this 1-CPU box) the CPU
# backend can SIGABRT mid-suite — an environment flake, not a code bug.
# scripts/run_tests.sh runs these in their own pytest process (crash
# isolation + one retry); `-m "not mesh"` skips them when the host is busy.
_MESH_HEAVY_MODULES = {
    "test_parallel",
    "test_trainer",
    "test_multistep",
    "test_gan_multistep",
    "test_tiling",
    "test_multiscale",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _MESH_HEAVY_MODULES:
            item.add_marker(pytest.mark.mesh)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
