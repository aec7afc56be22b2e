"""Fixed-capacity masked point-cloud containers.

TPU programs need static shapes: every cloud is a struct-of-arrays pytree with a
fixed capacity N and a validity mask.  This replaces the reference's dynamically
sized ``pcl::PointCloud`` (variable-size feature clouds, SURVEY.md §7.1
"Variable-size feature clouds -> fixed max counts + validity masks").

Fields mirror what the reference packs into PCL point attributes:
* ``ring``     — scan/ring id (the integer part of LOAM's ``intensity`` field,
                 MultiScanRegistration.cpp:168)
* ``rel_time`` — in-sweep time fraction in [0, 1) (the fractional part * 10)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Cloud:
    """Masked fixed-capacity point cloud.

    xyz:      [N, 3] float32 (invalid entries hold a far sentinel, see FAR)
    mask:     [N] bool
    ring:     [N] int32   (0 if unused)
    rel_time: [N] float32 (0 if unused)
    """

    xyz: jax.Array
    mask: jax.Array
    ring: jax.Array
    rel_time: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def masked_xyz(self, fill: float = 1e6):
        """xyz with invalid points pushed to a far sentinel (so they lose any
        nearest-neighbor race without branching)."""
        return jnp.where(self.mask[..., None], self.xyz, fill)


def make(xyz, mask, ring=None, rel_time=None) -> Cloud:
    n = xyz.shape[:-1]
    if ring is None:
        ring = jnp.zeros(n, jnp.int32)
    if rel_time is None:
        rel_time = jnp.zeros(n, jnp.float32)
    return Cloud(xyz, mask, ring, rel_time)


# Far-away sentinel used for invalid points in distance computations.  1e6 m is
# far outside lidarValidDistance (150 m, FeatureMap.h) so sentinel points can
# never be selected as neighbors under any squared-distance threshold.
FAR = 1.0e6


def from_points(xyz, capacity: Optional[int] = None, ring=None, rel_time=None) -> Cloud:
    """Build a Cloud from a dense [n, 3] array, padding to ``capacity``."""
    xyz = jnp.asarray(xyz, jnp.float32)
    n = xyz.shape[0]
    cap = capacity or n
    pad = cap - n
    if pad < 0:
        raise ValueError(f"capacity {cap} < number of points {n}")
    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    xyz = jnp.concatenate([xyz, jnp.full((pad, 3), FAR, jnp.float32)])
    if ring is not None:
        ring = jnp.concatenate([jnp.asarray(ring, jnp.int32), jnp.zeros(pad, jnp.int32)])
    if rel_time is not None:
        rel_time = jnp.concatenate(
            [jnp.asarray(rel_time, jnp.float32), jnp.zeros(pad, jnp.float32)]
        )
    return make(xyz, mask, ring, rel_time)


def empty(capacity: int) -> Cloud:
    return make(
        jnp.full((capacity, 3), FAR, jnp.float32),
        jnp.zeros(capacity, bool),
    )


def concat(a: Cloud, b: Cloud) -> Cloud:
    return Cloud(
        jnp.concatenate([a.xyz, b.xyz], axis=-2),
        jnp.concatenate([a.mask, b.mask], axis=-1),
        jnp.concatenate([a.ring, b.ring], axis=-1),
        jnp.concatenate([a.rel_time, b.rel_time], axis=-1),
    )


def compact(c: Cloud, capacity: Optional[int] = None) -> Cloud:
    """Stable-sort valid points to the front (still fixed shape).

    Useful before truncating to a smaller capacity: valid points survive.
    """
    cap = capacity or c.capacity
    order = jnp.argsort(~c.mask, stable=True)
    take = lambda arr: jnp.take(arr, order, axis=0)[:cap]
    return Cloud(take(c.xyz), take(c.mask), take(c.ring), take(c.rel_time))
