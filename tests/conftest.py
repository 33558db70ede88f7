"""Test harness config: force a virtual 8-device CPU mesh.

The TPU answer to multi-node testing without a cluster (SURVEY.md §4.5):
``--xla_force_host_platform_device_count=8`` fakes 8 CPU devices so
mesh/sharding/collective tests exercise the exact shard_map code that runs
on a real pod slice.

This environment preloads jax and registers a remote TPU backend via
sitecustomize *before* conftest runs, so env vars alone are too late —
``jax.config.update`` is the reliable switch (it works any time before
first backend initialization). Tests must never touch the real TPU: it is
a single remotely-tunnelled chip and concurrent claims block.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
