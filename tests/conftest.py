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
import resource

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

# XLA:CPU's compiler recurses deeply on large programs (the chunked
# soft-replay scans); with the default 8 MB main-thread stack a full
# suite run can SIGSEGV inside backend_compile late in the session
# (observed r5: crash in test_replay_soft at ~50% of the suite, same
# test green in isolation). The hard limit here is unlimited — raise
# the soft limit so the main stack may keep growing.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
