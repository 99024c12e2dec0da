"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 XLA host devices so that chain sharding,
collectives, and mesh logic are exercised without TPU hardware
(SURVEY.md section 4's distributed-test strategy).  Must run before the first
jax import in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Hard override: the container's sitecustomize registers the axon TPU tunnel
# and force-sets jax_platforms="axon,cpu" via jax.config (so the env var is
# not enough).  Tests must run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)
