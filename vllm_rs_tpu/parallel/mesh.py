"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(
    tp_size: int = 0, dp_size: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """("data", "model") mesh. tp_size == 0 → all (remaining) devices.

    On a real slice `mesh_utils.create_device_mesh` lays the model axis
    along ICI rings; on the CPU simulator any arrangement works.
    """
    devices = list(devices if devices is not None else jax.devices())
    if tp_size <= 0:
        tp_size = len(devices) // max(dp_size, 1)
    n = dp_size * tp_size
    assert n <= len(devices), (dp_size, tp_size, len(devices))
    try:
        dmesh = mesh_utils.create_device_mesh((dp_size, tp_size), devices=devices[:n])
    except Exception:
        dmesh = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(dmesh, axis_names=("data", "model"))
