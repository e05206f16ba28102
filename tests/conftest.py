"""Test configuration: force an 8-virtual-device CPU backend.

Tests are hermetic CPU runs (the real TPU chip is reserved for bench runs);
multi-chip sharding is exercised on the virtual device mesh, per the
multi-host test strategy in SURVEY.md §4.

Note: this sandbox's sitecustomize pre-registers the axon TPU PJRT plugin
and pins `jax_platforms`, so plain JAX_PLATFORMS=cpu in the environment is
ignored — we must override through jax.config before first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
