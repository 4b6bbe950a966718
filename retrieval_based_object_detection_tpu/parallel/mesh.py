"""Device-mesh helpers.

Axes used by this framework:
  dp      — data parallel over image batches (embedding/training)
  tp      — tensor parallel over the CLIP tower's hidden dims
  gallery — row-sharding of the vector gallery for distributed top-k

On real hardware the mesh should follow the physical ICI topology
(jax.experimental.mesh_utils does this); tests emulate with 8 CPU devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices: list | None = None) -> Mesh:
    """Build a mesh with named axes; sizes must multiply to #devices.

    ``make_mesh({"dp": 2, "tp": 4})`` → 2x4 mesh. With None, all devices go
    on a single ``dp`` axis.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh sizes {axis_sizes} do not multiply to {len(devices)} devices"
        )
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(sizes, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def gallery_mesh(n_shards: int | None = None) -> Mesh:
    """1-D mesh over the gallery axis."""
    devices = jax.devices()
    n = n_shards or len(devices)
    return make_mesh({"gallery": n}, devices[:n])
