"""LaserMapping / LaserMappingLocal / LaserLocalization pipeline stages.

Re-design of the ``LaserMatcher`` family
(/root/reference/L_SLAM/src/odometry/LaserMatcher.{h,cpp}, LaserMapping.cpp,
LaserMappingLocal.cpp, LaserLocalization.cpp).  The shared machinery
(transformMerge -> prepareFeatureFrame -> prepareFeatureSurround ->
optimizeTransform -> transformUpdate -> featureMapUpdate,
LaserMapping.cpp:39-59) becomes one functional step over an explicit state:

* ``transform_merge`` chains the mapping correction onto fresh odometry
  (transformAssociate, LaserMatcher.cpp:333-340),
* the solve is ops/scan_match against the map surround,
* the map update inserts the registered stacks (FeatureMap or the
  sliding-window LocalFeatureMap).

The reference's mutex-guarded ``_lidarOdomLast``/``_lidarMappedLast`` race
(SURVEY.md §3.3) is gone by construction: the merged high-rate pose output is
``W_last @ inv(L_last) @ L_now`` computed on demand.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import MapConfig, MatcherConfig, ScanMatchConfig
from ..maps import feature_map as fm
from ..maps import local_map as lm
from ..ops import scan_match as sm
from ..ops.voxel import voxel_downsample
from ..utils import cloud as cloud_lib
from ..utils import se3, twist
from ..utils.cloud import Cloud


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MatcherState:
    """Shared scan-to-map tracking state (LaserMatcher.h:34-172)."""

    L_last: jax.Array  # [4,4] odometry pose at last mapping solve
    W_last: jax.Array  # [4,4] map-corrected pose at last mapping solve


def create_matcher() -> MatcherState:
    return MatcherState(
        L_last=jnp.eye(4, dtype=jnp.float32),
        W_last=jnp.eye(4, dtype=jnp.float32),
    )


def merged_pose(state: MatcherState, L_now):
    """High-rate merged pose: the 10 Hz /lidar_to_map2 output
    (laserOdometryHandler, LaserMatcher.cpp:221-261)."""
    return se3.transform_associate(state.L_last, L_now, state.W_last)


def prepare_frame(corner: Cloud, surf: Cloud, cfg: MatcherConfig):
    """Voxel-downsample the incoming end-projected feature stacks
    (prepareFeatureFrame, LaserMatcher.cpp:288-301)."""
    return (
        voxel_downsample(corner, cfg.corner_leaf, cfg.max_frame_corner),
        voxel_downsample(surf, cfg.surf_leaf, cfg.max_frame_surf),
    )


def _to_world(c: Cloud, T) -> Cloud:
    xyz = se3.apply(T, c.xyz)
    return cloud_lib.Cloud(
        jnp.where(c.mask[:, None], xyz, cloud_lib.FAR), c.mask, c.ring, c.rel_time
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MappingOutput:
    W: jax.Array              # corrected world pose after the solve
    result: sm.ScanMatchResult
    # downsampled frame stacks in the sensor frame — the reference publishes
    # these as /laser_cloud_{corner,surf}_last2, which the Graph node ingests
    # as keyframe clouds (LaserMatcher.cpp:357-383, graph.cpp:301-312)
    corner_ds: Cloud
    surf_ds: Cloud


@partial(jax.jit, static_argnames=("sm_cfg", "matcher_cfg", "map_cfg", "recenter"))
def mapping_step(
    matcher: MatcherState,
    map_state: fm.FeatureMapState,
    corner: Cloud,
    surf: Cloud,
    L_now,
    sm_cfg: ScanMatchConfig,
    matcher_cfg: MatcherConfig,
    map_cfg: MapConfig,
    recenter: bool = True,
):
    """Full LaserMapping step against the cube-grid map.

    ``recenter=False`` skips the in-jit recentring — the dynamic (out-of-core)
    pipeline mode recenters on the host inside DynamicFeatureMap.page(),
    which must flush departing cubes to disk BEFORE the toroidal recenter
    mask-clears their slots for reuse by entering world cubes
    (DynamicFeatureMap.h:504-677).

    Returns (matcher', map_state', MappingOutput).
    """
    T_guess = se3.transform_associate(matcher.L_last, L_now, matcher.W_last)

    corner_ds, surf_ds = prepare_frame(corner, surf, matcher_cfg)

    sensor_pos = T_guess[:3, 3]
    if recenter:
        map_state = fm.recenter(map_state, sensor_pos, map_cfg)
    ref_corner, ref_surf = fm.get_surround(map_state, sensor_pos, map_cfg)

    res = sm.scan_match(
        corner_ds, surf_ds, ref_corner, ref_surf, twist.from_mat(T_guess), sm_cfg
    )
    W_new, map_state = _commit(
        res, T_guess, map_state, corner_ds, surf_ds, map_cfg, matcher_cfg
    )

    matcher_new = MatcherState(L_last=L_now, W_last=W_new)
    return matcher_new, map_state, MappingOutput(
        W=W_new, result=res, corner_ds=corner_ds, surf_ds=surf_ds
    )


def _commit(res, T_guess, map_state, corner_ds, surf_ds, map_cfg, matcher_cfg):
    """Commit the solve into (pose, map) honoring the rejection policy.

    commit_rejected_solves=True reproduces the reference: the solved pose is
    committed and inserted even when the score gate rejected it
    (ScanMatch.cpp:325-346 writes transformf on every exit; LaserMapping
    ignores the returned bool, LaserMatcher.cpp:327-331,349-355).  The
    default instead falls back to the DEAD-RECKONED merge guess for a
    rejected solve — the treatment LaserLocalization gives the same gate
    (LaserLocalization.cpp:140-166) — and inserts the frame at that guess:
    the map keeps growing (skipping inserts starves it into a rejection
    spiral), but gate-flagged solve geometry never enters it; rejected
    frames carry at worst the odometry drift.
    """
    if matcher_cfg.commit_rejected_solves:
        W_new = twist.to_mat(res.x)
    else:
        W_new = jnp.where(res.success, twist.to_mat(res.x), T_guess)
    map_state = fm.add_feature_cloud(
        map_state, _to_world(corner_ds, W_new), _to_world(surf_ds, W_new),
        map_cfg,
    )
    return W_new, map_state


@partial(jax.jit, static_argnames=("sm_cfg", "matcher_cfg", "surround_corner",
                                   "surround_surf"))
def mapping_local_step(
    matcher: MatcherState,
    map_state: lm.LocalMapState,
    corner: Cloud,
    surf: Cloud,
    L_now,
    sm_cfg: ScanMatchConfig,
    matcher_cfg: MatcherConfig,
    surround_corner: int = 8192,
    surround_surf: int = 16384,
):
    """LaserMappingLocal step: sliding-window map (LaserMappingLocal.cpp:55-77)."""
    T_guess = se3.transform_associate(matcher.L_last, L_now, matcher.W_last)
    corner_ds, surf_ds = prepare_frame(corner, surf, matcher_cfg)
    ref_corner, ref_surf = lm.get_surround(map_state, surround_corner, surround_surf,
                                           matcher_cfg.corner_leaf, matcher_cfg.surf_leaf)

    res = sm.scan_match(
        corner_ds, surf_ds, ref_corner, ref_surf, twist.from_mat(T_guess), sm_cfg
    )
    if matcher_cfg.commit_rejected_solves:
        W_new = twist.to_mat(res.x)
    else:
        # same rejection policy as mapping_step (_commit): dead-reckoned
        # pose on gate failure, frame still enters the sliding window
        W_new = jnp.where(res.success, twist.to_mat(res.x), T_guess)

    map_state = lm.add_frame(
        map_state, _to_world(corner_ds, W_new), _to_world(surf_ds, W_new), W_new
    )
    matcher_new = MatcherState(L_last=L_now, W_last=W_new)
    return matcher_new, map_state, MappingOutput(
        W=W_new, result=res, corner_ds=corner_ds, surf_ds=surf_ds
    )


@partial(jax.jit, static_argnames=("sm_cfg", "matcher_cfg", "map_cfg"))
def localization_step(
    matcher: MatcherState,
    map_state: fm.FeatureMapState,
    corner: Cloud,
    surf: Cloud,
    L_now,
    sm_cfg: ScanMatchConfig,
    matcher_cfg: MatcherConfig,
    map_cfg: MapConfig,
):
    """LaserLocalization step: match against a pre-built map, NO map update
    (LaserLocalization.cpp:124-138).  The pose is committed only on a
    successful gate — a failed relocalization keeps the dead-reckoned guess.
    """
    T_guess = se3.transform_associate(matcher.L_last, L_now, matcher.W_last)
    corner_ds, surf_ds = prepare_frame(corner, surf, matcher_cfg)
    sensor_pos = T_guess[:3, 3]
    ref_corner, ref_surf = fm.get_surround(map_state, sensor_pos, map_cfg)

    res = sm.scan_match(
        corner_ds, surf_ds, ref_corner, ref_surf, twist.from_mat(T_guess), sm_cfg
    )
    W_new = jnp.where(res.success, twist.to_mat(res.x), T_guess)

    matcher_new = MatcherState(L_last=L_now, W_last=W_new)
    return matcher_new, MappingOutput(
        W=W_new, result=res, corner_ds=corner_ds, surf_ds=surf_ds
    )


def seed_localization(matcher: MatcherState, pose, L_now) -> MatcherState:
    """(Re)seed from an initial pose (initialpose/GNSS, LaserLocalization.cpp:39-110)."""
    return MatcherState(L_last=L_now, W_last=pose)
