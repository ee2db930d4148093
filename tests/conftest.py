"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Mirrors the reference's deviceless/simulated-distributed test strategy
(SURVEY.md §4).

Two environment quirks this must defeat:
- ``sitecustomize.py`` (axon) pre-imports jax in every process, so env-var
  mutation here is too late for jax's config — use ``jax.config.update``.
- ``JAX_PLATFORMS=axon`` is preset globally; left alone, every unit test
  would compile over the TPU tunnel. Set ``LVLLM_TEST_TPU=1`` to opt in to
  hardware tests.
"""

import os

# XLA_FLAGS is read lazily at backend creation, so setting it here works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("LVLLM_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
