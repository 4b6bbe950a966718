"""Test harness: force the CPU backend with 8 virtual devices.

All tests run on an emulated 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding logic
is exercised without TPU hardware.

Gotcha: this image's ``sitecustomize.py`` (from PYTHONPATH=/root/.axon_site)
imports jax at interpreter start to register the axon TPU plugin, so jax has
already snapshotted ``JAX_PLATFORMS=axon`` from the shell env by the time
this conftest runs. Setting os.environ alone is NOT enough — we must also
update jax.config before any backend is initialised.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
