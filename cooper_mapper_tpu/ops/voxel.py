"""Fixed-shape voxel-grid downsampling.

TPU-native replacement for ``pcl::VoxelGrid`` (used throughout the reference:
less-flat cloud downsizing ScanRegistration.cpp:390-399, feature-frame prep
LaserMatcher.cpp:288-301, map cube re-voxelization FeatureMap.h:289-306,
scanMatchLocal ScanMatch.cpp:375-398).

Matches PCL semantics: the output point for each occupied voxel is the
*centroid* of the points inside it.  Implemented with static shapes via
lexicographic sort + segment-sum: no host round trips, fully jit/vmap
compatible, and no bounded-lattice assumption (cell coords are signed ints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import cloud as cloud_lib
from ..utils.cloud import Cloud


def voxel_coords(xyz, leaf):
    """Signed int32 voxel cell coordinates."""
    return jnp.floor(xyz / leaf).astype(jnp.int32)


def voxel_downsample(c: Cloud, leaf: float, capacity: int | None = None,
                     keep_first: bool = False) -> Cloud:
    """Voxel filter.  Output capacity defaults to input capacity.

    Invalid input points never contribute.  Default output is the voxel
    centroid (pcl::VoxelGrid semantics).  ``keep_first=True`` instead keeps
    the first input point of each voxel (the lexsort is stable, so "first"
    means lowest original index): used by the map's anchor dedup policy,
    where each voxel must stay pinned to its OLDEST observation so newer,
    drift-carrying inserts cannot drag the map (see maps/feature_map.py
    dedup_active).
    """
    n = c.capacity
    capacity = capacity or n
    ijk = voxel_coords(c.xyz, leaf)
    # push invalid points into a dedicated far cell so they form one segment
    ijk = jnp.where(c.mask[:, None], ijk, jnp.int32(2**20))

    # lexsort: last key is primary -> invalid last, then i, j, k
    order = jnp.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0], ~c.mask))
    ijk_s = ijk[order]
    xyz_s = c.xyz[order]
    mask_s = c.mask[order]
    ring_s = c.ring[order]
    rel_s = c.rel_time[order]

    # segment boundaries where any cell coordinate changes
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(ijk_s[1:] != ijk_s[:-1], axis=-1)]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [n], 0-based

    # one output per voxel: the first sorted point carries the metadata
    out_mask = new_seg & mask_s
    if keep_first:
        out_xyz = jnp.where(out_mask[:, None], xyz_s, cloud_lib.FAR)
    else:
        w = mask_s.astype(jnp.float32)
        sums = jax.ops.segment_sum(xyz_s * w[:, None], seg_id, num_segments=n)
        cnts = jax.ops.segment_sum(w, seg_id, num_segments=n)
        centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
        out_xyz = jnp.where(out_mask[:, None], centroids[seg_id], cloud_lib.FAR)
    out = cloud_lib.make(out_xyz, out_mask, ring_s, rel_s)
    return cloud_lib.compact(out, capacity)
