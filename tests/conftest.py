"""Test configuration: force a CPU backend with an 8-device virtual mesh.

Multi-device sharding tests run on a host-simulated mesh per SURVEY.md §4
(``--xla_force_host_platform_device_count=8``).  The sandbox's sitecustomize
imports jax and registers the (single-chip, exclusive) TPU backend at
interpreter startup — before conftest — so we cannot rely on env mutation
alone; ``jax.config.update('jax_platforms', 'cpu')`` before the first backend
use redirects everything to CPU (backend clients are created lazily).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)
