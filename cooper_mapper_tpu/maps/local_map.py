"""Sliding-window local feature map.

Re-design of ``LocalFeatureMap<PointT>`` + ``DataFrame`` + ``FrameUpdater``
(/root/reference/L_SLAM/src/io_module/LocalFeatureMap.h:29-99, DataFrame.h,
FrameUpdater.hpp:17-42): a ring buffer of recent keyframe-like feature
frames, evicted by traveled distance, concatenated + voxel-filtered into the
matching surround.

Fixed shapes: the window holds ``window`` frames of fixed capacities; eviction
is mask-based (no reallocation).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import KeyframeConfig
from ..utils import cloud as cloud_lib
from ..utils.cloud import Cloud
from ..ops.voxel import voxel_downsample


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LocalMapState:
    """Ring buffer of world-frame feature frames."""

    corner_xyz: jax.Array   # [W, Nc, 3]
    corner_mask: jax.Array  # [W, Nc]
    surf_xyz: jax.Array     # [W, Ns, 3]
    surf_mask: jax.Array    # [W, Ns]
    accum_dist: jax.Array   # [W] traveled distance at frame insertion
    frame_valid: jax.Array  # [W]
    head: jax.Array         # [] next slot
    last_pos: jax.Array     # [3] position at last accepted frame
    last_rot: jax.Array     # [3,3]
    total_dist: jax.Array   # [] accumulated travel


def create(window: int, corner_cap: int, surf_cap: int) -> LocalMapState:
    return LocalMapState(
        corner_xyz=jnp.full((window, corner_cap, 3), cloud_lib.FAR, jnp.float32),
        corner_mask=jnp.zeros((window, corner_cap), bool),
        surf_xyz=jnp.full((window, surf_cap, 3), cloud_lib.FAR, jnp.float32),
        surf_mask=jnp.zeros((window, surf_cap), bool),
        accum_dist=jnp.zeros(window, jnp.float32),
        frame_valid=jnp.zeros(window, bool),
        head=jnp.zeros((), jnp.int32),
        last_pos=jnp.full(3, jnp.inf, jnp.float32),
        last_rot=jnp.eye(3, dtype=jnp.float32),
        total_dist=jnp.zeros((), jnp.float32),
    )


@partial(jax.jit, static_argnames=("cfg",))
def add_frame(
    state: LocalMapState,
    corner_world: Cloud,
    surf_world: Cloud,
    pose,
    cfg: KeyframeConfig = KeyframeConfig(),
    eviction_distance: float = 30.0,
) -> LocalMapState:
    """Distance/angle-gated insert (FrameUpdater thresholds 0.25 m / 0.05 rad)
    plus eviction of frames older than total_dist - eviction_distance."""
    pos = pose[:3, 3]
    rot = pose[:3, :3]
    dt = jnp.linalg.norm(pos - state.last_pos)
    cos_da = 0.5 * (jnp.trace(state.last_rot.T @ rot) - 1.0)
    da = jnp.arccos(jnp.clip(cos_da, -1.0, 1.0))
    first = ~jnp.isfinite(dt)
    accept = first | (dt > cfg.keyframe_delta_trans) | (da > cfg.keyframe_delta_angle)

    dist_new = jnp.where(first, state.total_dist, state.total_dist + dt)
    slot = state.head

    def ins(arr, new):
        return jnp.where(accept, arr.at[slot].set(new), arr)

    corner_c = cloud_lib.compact(corner_world, state.corner_xyz.shape[1])
    surf_c = cloud_lib.compact(surf_world, state.surf_xyz.shape[1])

    new_state = LocalMapState(
        corner_xyz=ins(state.corner_xyz, corner_c.xyz),
        corner_mask=ins(state.corner_mask, corner_c.mask),
        surf_xyz=ins(state.surf_xyz, surf_c.xyz),
        surf_mask=ins(state.surf_mask, surf_c.mask),
        accum_dist=jnp.where(
            accept, state.accum_dist.at[slot].set(dist_new), state.accum_dist
        ),
        frame_valid=jnp.where(
            accept, state.frame_valid.at[slot].set(True), state.frame_valid
        ),
        head=jnp.where(accept, (slot + 1) % state.frame_valid.shape[0], slot),
        last_pos=jnp.where(accept, pos, state.last_pos),
        last_rot=jnp.where(accept, rot, state.last_rot),
        total_dist=dist_new,
    )
    # distance-based eviction (LocalFeatureMap.h:70-81)
    stale = new_state.frame_valid & (
        new_state.accum_dist < new_state.total_dist - eviction_distance
    )
    return dataclasses.replace(
        new_state,
        frame_valid=new_state.frame_valid & ~stale,
        corner_mask=new_state.corner_mask & ~stale[:, None],
        surf_mask=new_state.surf_mask & ~stale[:, None],
    )


@partial(jax.jit, static_argnames=("corner_capacity", "surf_capacity"))
def get_surround(
    state: LocalMapState,
    corner_capacity: int,
    surf_capacity: int,
    corner_leaf: float = 0.2,
    surf_leaf: float = 0.4,
):
    """Concatenate window frames and voxel-filter (LocalFeatureMap.h:84-99)."""
    def pool(xyz, mask, cap, leaf):
        c = cloud_lib.make(
            jnp.where(mask[..., None], xyz, cloud_lib.FAR).reshape(-1, 3),
            mask.reshape(-1),
        )
        c = cloud_lib.compact(c, cap)
        return voxel_downsample(c, leaf)

    return (
        pool(state.corner_xyz, state.corner_mask, corner_capacity, corner_leaf),
        pool(state.surf_xyz, state.surf_mask, surf_capacity, surf_leaf),
    )
