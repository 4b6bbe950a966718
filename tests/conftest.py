"""Test harness: force the CPU backend with 8 virtual devices.

All tests run on an emulated 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding logic
is exercised without TPU hardware. These env vars must be set before JAX is
imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
