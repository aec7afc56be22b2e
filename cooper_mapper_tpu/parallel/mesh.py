"""Device mesh and sharding helpers.

The reference's distribution story is ROS pub/sub between single-machine
processes (SURVEY.md §2.8); here scaling is SPMD over a ``jax.sharding.Mesh``:
batch-parallel sweep solves shard over the ``batch`` axis, and the pose-graph
normal equations reduce per-edge contributions with psum over the same mesh
(ICI collectives, no host round trips).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, axis: str = BATCH_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (batch/problem) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = BATCH_AXIS):
    """Device-put every leaf with its leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
