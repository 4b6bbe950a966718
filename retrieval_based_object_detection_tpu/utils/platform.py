"""Backend selection helpers.

This image's ``sitecustomize.py`` registers the axon TPU plugin and imports
jax at interpreter startup, so ``JAX_PLATFORMS`` from the shell is already
snapshotted before user code runs. Selecting a backend therefore requires
``jax.config.update``, not just os.environ.
"""

from __future__ import annotations

import jax


def force_cpu(num_devices: int = 1) -> None:
    """Run this process on the CPU backend (optionally with N virtual
    devices for mesh emulation). Must be called before first jax op."""
    jax.config.update("jax_platforms", "cpu")
    if num_devices > 1:
        jax.config.update("jax_num_cpu_devices", num_devices)


def backend_name() -> str:
    return jax.default_backend()


def is_tpu() -> bool:
    return any(d.platform == "tpu" for d in jax.devices())
