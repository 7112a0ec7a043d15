"""Mesh construction and sharding helpers.

One backend for all distribution (SURVEY.md §5.8): ``jax.sharding.Mesh`` over
the process's devices; GSPMD routes intra-slice traffic over ICI and
cross-slice over DCN from the sharding annotations alone.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("traj", "horizon"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh over the available devices.

    Defaults: all devices on the ``traj`` axis, 1 on ``horizon``. For
    horizon-partitioned Riccati pass e.g. ``axis_shapes=(1, 8)``.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if axis_shapes is None:
        axis_shapes = (len(devs),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_shapes)) != len(devs):
        raise ValueError(f"axis_shapes {axis_shapes} != device count {len(devs)}")
    grid = np.asarray(devs).reshape(axis_shapes)
    return Mesh(grid, axis_names=tuple(axis_names))


def traj_sharding(mesh: Mesh, axis: str = "traj") -> NamedSharding:
    """Shard the leading (trajectory-batch) axis over the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis))
