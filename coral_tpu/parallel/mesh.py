"""Device mesh construction.

The reference's multi-GPU story is NCCL data parallelism via accelerate/DeepSpeed
(reference: ``makefile:80-93``). Here the equivalent is a ``jax.sharding.Mesh``:
data parallelism shards the batch over the "data" axis (gradient allreduce becomes
an XLA psum over ICI); the "model" axis is available for tensor-parallel sharding
of the largest checkpoints.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_MODEL = "model"


def create_mesh(
    shape: tuple[int, int] | None = None, devices: list | None = None
) -> Mesh:
    """Create a (data, model) mesh.

    Args:
        shape: (data, model) extent. None = all devices on the data axis.
        devices: Devices to use; defaults to ``jax.devices()``.

    Returns:
        The mesh.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    dp, mp = shape
    assert dp * mp <= n, f"mesh shape {shape} needs more than {n} devices"
    device_array = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(device_array, (AXIS_DATA, AXIS_MODEL))
