"""Device-mesh helpers.

The reference has no multi-device support at all (SURVEY.md §2.4); sweeps
run serially (ref launch.py:167-178) and training is single-GPU.  Here the
device fabric is a first-class axis: a 1-D ``jax.sharding.Mesh`` carries
either sweep grid points (one hyperparameter point per device group) or the
batch (data parallelism); XLA inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh(axis: str = "grid", n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def grid_sharding(mesh: Mesh, axis: str = "grid") -> NamedSharding:
    """Leading-axis sharding for stacked per-point pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh, axis: str = "grid"):
    """Place every leaf of a stacked pytree with its leading (grid) axis
    split across the mesh."""
    sharding = grid_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
