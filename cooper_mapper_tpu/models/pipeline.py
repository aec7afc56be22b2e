"""Full SLAM pipeline driver.

The functional equivalent of the reference's launch-file topology
(/root/reference/L_SLAM/launch/node/lidar_mapping.launch:13-44): scan
registration -> laser odometry (every sweep) -> laser mapping (every Nth
sweep) -> merged high-rate pose, composed as pure dataflow in one process —
the nodelet deployment (nodelets.xml) collapsed into a single program with
donated on-device state instead of serialized topics.

The host loop only sequences jitted steps and keeps python-side flags
(initialization, stride counting); all numerics stay on device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..maps import feature_map as fm
from ..maps import local_map as lm
from ..ops import features as feat_ops
from ..ops.features import Sweep
from ..utils import se3
from . import laser_mapping, laser_odometry


@dataclasses.dataclass
class SweepResult:
    odom_pose: np.ndarray       # odometry-only pose (laser_odom_to_init)
    merged_pose: np.ndarray     # mapping-corrected high-rate pose (/lidar_to_map2)
    mapped_pose: Optional[np.ndarray]  # pose after a mapping solve, if one ran
    mapping_success: Optional[bool]
    odom_matched: int


class SlamPipeline:
    """mode: 'mapping' (cube-grid map), 'local' (sliding window),
    'localization' (fixed pre-built map, no updates)."""

    def __init__(
        self,
        cfg: PipelineConfig = PipelineConfig(),
        mode: str = "mapping",
        map_state: Optional[fm.FeatureMapState] = None,
        initial_pose: Optional[np.ndarray] = None,
    ):
        self.cfg = cfg
        self.mode = mode
        r = cfg.registration
        self.odo = laser_odometry.create(r.max_less_sharp, r.max_less_flat)
        self.matcher = laser_mapping.create_matcher()
        if mode in ("mapping", "localization"):
            self.map_state = map_state if map_state is not None else fm.create(cfg.feature_map)
        else:
            self.map_state = lm.create(64, cfg.matcher.max_frame_corner,
                                       cfg.matcher.max_frame_surf)
        if initial_pose is not None:
            T0 = jnp.asarray(initial_pose, jnp.float32)
            self.matcher = laser_mapping.MatcherState(
                L_last=jnp.eye(4, dtype=jnp.float32), W_last=T0
            )
        self._initialized = False
        self._sweep_idx = 0
        self.trajectory: list[np.ndarray] = []       # merged poses per sweep
        self.odom_trajectory: list[np.ndarray] = []

    def process(self, sweep: Sweep) -> SweepResult:
        cfg = self.cfg
        fc = feat_ops.extract_features(sweep, cfg.registration)

        if not self._initialized:
            self.odo = laser_odometry.init_step(self.odo, fc, cfg.odometry)
            self._initialized = True
            self._sweep_idx += 1
            eye = np.eye(4, dtype=np.float32)
            merged = np.asarray(self.matcher.W_last)
            self.trajectory.append(merged)
            self.odom_trajectory.append(eye)
            return SweepResult(eye, merged, None, None, 0)

        self.odo, odo_out = laser_odometry.step(self.odo, fc, cfg.odometry)
        L_now = odo_out.T_sum

        mapped_pose = None
        mapping_success = None
        if (self._sweep_idx % max(cfg.mapping_stride, 1)) == 0 or self._sweep_idx <= 2:
            if self.mode == "mapping":
                self.matcher, self.map_state, mo = laser_mapping.mapping_step(
                    self.matcher, self.map_state,
                    odo_out.corner_for_map, odo_out.surf_for_map, L_now,
                    cfg.scan_match, cfg.matcher, cfg.feature_map,
                )
            elif self.mode == "local":
                self.matcher, self.map_state, mo = laser_mapping.mapping_local_step(
                    self.matcher, self.map_state,
                    odo_out.corner_for_map, odo_out.surf_for_map, L_now,
                    cfg.scan_match, cfg.matcher,
                )
            else:
                self.matcher, mo = laser_mapping.localization_step(
                    self.matcher, self.map_state,
                    odo_out.corner_for_map, odo_out.surf_for_map, L_now,
                    cfg.scan_match, cfg.matcher, cfg.feature_map,
                )
            mapped_pose = np.asarray(mo.W)
            mapping_success = bool(mo.result.success)

        merged = np.asarray(laser_mapping.merged_pose(self.matcher, L_now))
        self._sweep_idx += 1
        self.trajectory.append(merged)
        self.odom_trajectory.append(np.asarray(L_now))
        return SweepResult(
            odom_pose=np.asarray(L_now),
            merged_pose=merged,
            mapped_pose=mapped_pose,
            mapping_success=mapping_success,
            odom_matched=int(odo_out.n_matched),
        )
