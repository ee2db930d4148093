"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Mirrors the reference's deviceless/simulated-distributed test strategy
(SURVEY.md §4).
"""

import os

# Must be set before jax import (any jax import initializes backends).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("LVLLM_USE_REFERENCE_OPS", "0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax
    return jax.devices("cpu")
