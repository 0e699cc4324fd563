"""Test harness config.

Runs the whole suite on CPU with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware, per
SURVEY.md §4.

Note: this environment preloads jax via a sitecustomize hook (axon TPU
tunnel), so setting JAX_PLATFORMS in os.environ at conftest import time is
too late — we must force the platform through jax.config before any backend
initializes.  XLA_FLAGS is still honored lazily at first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
