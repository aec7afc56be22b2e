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
from ..fusion import imu_queue, ukf_estimator
from ..maps import feature_map as fm
from ..maps import local_map as lm
from ..ops import features as feat_ops
from ..ops.features import Sweep
from ..utils import profiling, se3
from . import laser_mapping, laser_odometry, scan_registration, transform_maintenance


@dataclasses.dataclass
class SweepResult:
    odom_pose: np.ndarray       # odometry-only pose (laser_odom_to_init)
    merged_pose: np.ndarray     # mapping-corrected high-rate pose (/lidar_to_map2)
    mapped_pose: Optional[np.ndarray]  # pose after a mapping solve, if one ran
    mapping_success: Optional[bool]
    odom_matched: int
    # graph-corrected pose (/aft_graph_to_init): T_odom2graph applied to the
    # merged pose (graph.cpp:368-378); None when the graph is disabled
    graph_pose: Optional[np.ndarray] = None
    new_keyframe: bool = False
    loop_closed: bool = False


class SlamPipeline:
    """mode: 'mapping' (cube-grid map), 'local' (sliding window),
    'localization' (fixed pre-built map, no updates)."""

    def __init__(
        self,
        cfg: PipelineConfig = PipelineConfig(),
        mode: str = "mapping",
        map_state: Optional[fm.FeatureMapState] = None,
        initial_pose: Optional[np.ndarray] = None,
        map_mesh=None,
    ):
        """``map_mesh``: a jax.sharding.Mesh — shard the cube map over its
        devices (maps/sharded_map.py: per-device cube shards, all_gather
        surround; SURVEY §5 axis (b)).  Mapping mode only; mutually
        exclusive with ``matcher.dynamic_mode`` (disk paging is a host-side
        single-array path)."""
        self.cfg = cfg
        self.mode = mode
        self.map_mesh = map_mesh
        if map_mesh is not None:
            if mode != "mapping":
                raise ValueError("map_mesh requires mode='mapping'")
            if cfg.matcher.dynamic_mode:
                raise ValueError(
                    "map_mesh is incompatible with matcher.dynamic_mode")
        r = cfg.registration
        self.odo = laser_odometry.create(r.max_less_sharp, r.max_less_flat)
        self.matcher = laser_mapping.create_matcher()
        # out-of-core map: the pipeline's dynamicMode switch
        # (LaserMatcher.cpp:107-118) — the device window is still a
        # FeatureMapState; DynamicFeatureMap adds the host paging ledger
        self.dynamic = mode == "mapping" and cfg.matcher.dynamic_mode
        self.dmap = None
        if self.dynamic:
            from ..maps import dynamic_map as dyn

            self.dmap = dyn.DynamicFeatureMap.create(
                cfg.feature_map, cfg.matcher.map_directory
            )
            self.map_state = self.dmap.state
        elif map_mesh is not None:
            from ..maps import sharded_map as smap

            self.map_state = (
                smap.from_single(map_state, cfg.feature_map, map_mesh)
                if map_state is not None
                else smap.create_sharded(cfg.feature_map, map_mesh)
            )
        elif mode in ("mapping", "localization"):
            self.map_state = map_state if map_state is not None else fm.create(cfg.feature_map)
        else:
            self.map_state = lm.create(64, cfg.matcher.max_frame_corner,
                                       cfg.matcher.max_frame_surf)
        # pose-graph backend riding the mapping output (graph.cpp:301-378)
        self.graph = None
        if cfg.enable_graph:
            from . import graph as graph_mod

            self.graph = graph_mod.GraphSlam(
                cfg.keyframe, cfg.loop, cfg.pose_graph, cfg.scan_match
            )
        self.graph_trajectory: list[np.ndarray] = []
        self._mapping_count = 0
        # the reference's destructor counters (ScanMatch.cpp:35-49 prints
        # match_count / fail_match_count / averageScore at teardown;
        # MultiScanRegistration.cpp:14-16 counts frames) — kept live here
        # and reported by stats()
        self._match_count = 0
        self._fail_match_count = 0
        self._total_score = 0.0
        if initial_pose is not None:
            T0 = jnp.asarray(initial_pose, jnp.float32)
            self.matcher = laser_mapping.MatcherState(
                L_last=jnp.eye(4, dtype=jnp.float32), W_last=T0
            )
        self._initialized = False
        self._sweep_idx = 0
        self.trajectory: list[np.ndarray] = []       # merged poses per sweep
        self.odom_trajectory: list[np.ndarray] = []
        # IMU/UKF fusion (IMUQueue inside every LaserMatcher, LaserMatcher.cpp:47;
        # engaged in LaserLocalization::transformUpdate, LaserLocalization.cpp:140-166)
        self.ukf = ukf_estimator.create(cfg.ukf)
        self.T_li = jnp.eye(4, dtype=jnp.float32)    # lidar -> imu extrinsic
        self._last_stamp: Optional[float] = None
        self._last_fused_pos: Optional[np.ndarray] = None
        # per-stage wall-clock accounting (the reference's ad-hoc clock()
        # deltas / destructor counters, SURVEY.md §5); timer.report() prints
        self.timer = profiling.StageTimer()

    def process(self, sweep: Sweep, imu: Optional[imu_queue.ImuBatch] = None,
                stamp: Optional[float] = None,
                imu_history=None) -> SweepResult:
        """Process one sweep; optionally fuse an IMU window ending at ``stamp``.

        With IMU data the UKF replays the window's predicts and is corrected
        by the mapping result (LaserLocalization::transformUpdate); the fused
        pose is available via ``fused_pose()`` / ``imu_rate_poses()``.

        ``imu_history`` (a scan_registration.ImuHistory) additionally
        de-warps the sweep by the nonlinear IMU motion before feature
        extraction (ScanRegistration::transformToStartIMU).
        """
        cfg = self.cfg
        with self.timer.stage("registration", sync=lambda: fc):
            if imu_history is not None and stamp is not None:
                sweep = scan_registration.imu_dewarp(
                    sweep, imu_history, stamp, cfg.registration.scan_period
                )
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

        with self.timer.stage("odometry", sync=lambda: odo_out.T_sum):
            self.odo, odo_out = laser_odometry.step(self.odo, fc, cfg.odometry)
        L_now = odo_out.T_sum

        mapped_pose = None
        mapping_success = None
        mo = None
        if (self._sweep_idx % max(cfg.mapping_stride, 1)) == 0 or self._sweep_idx <= 2:
            with self.timer.stage(f"mapping[{self.mode}]", sync=lambda: mo.W):
                if self.mode == "mapping" and self.map_mesh is not None:
                    from ..maps import sharded_map as smap

                    self.matcher, self.map_state, mo = smap.mapping_step(
                        self.matcher, self.map_state,
                        odo_out.corner_for_map, odo_out.surf_for_map, L_now,
                        cfg.scan_match, cfg.matcher, cfg.feature_map,
                        self.map_mesh,
                    )
                elif self.mode == "mapping":
                    if self.dynamic:
                        # page BEFORE the solve: flush departing cubes to
                        # disk, recenter the window on the host, prefetch
                        # entering cubes (update(), DynamicFeatureMap.h:504-677)
                        with self.timer.stage("paging"):
                            T_guess = np.asarray(
                                laser_mapping.merged_pose(self.matcher, L_now)
                            )
                            self.dmap.state = self.map_state
                            self.dmap.page(T_guess[:3, 3])
                            self.map_state = self.dmap.state
                    self.matcher, self.map_state, mo = laser_mapping.mapping_step(
                        self.matcher, self.map_state,
                        odo_out.corner_for_map, odo_out.surf_for_map, L_now,
                        cfg.scan_match, cfg.matcher, cfg.feature_map,
                        recenter=not self.dynamic,
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
            self._mapping_count += 1
            if mapping_success:
                self._match_count += 1
                self._total_score += float(mo.result.score)
            else:
                self._fail_match_count += 1
            # in-loop map hygiene: re-voxelize the active cubes so long runs
            # never saturate cube capacity (downsizeValidCloud runs every
            # mapping pass in the reference, FeatureMap.h:289-306; the stride
            # amortizes the gather/scatter)
            ds = cfg.matcher.dedup_stride
            if (
                self.mode == "mapping" and ds > 0
                and self._mapping_count % ds == 0
            ):
                with self.timer.stage("dedup", sync=lambda: self.map_state.surf.count):
                    if self.map_mesh is not None:
                        from ..maps import sharded_map as smap

                        self.map_state = smap.dedup_active(
                            self.map_state, mo.W[:3, 3], cfg.feature_map,
                            self.map_mesh,
                        )
                    else:
                        self.map_state = fm.dedup_active(
                            self.map_state, mo.W[:3, 3], cfg.feature_map
                        )
                if self.dynamic:
                    self.dmap.state = self.map_state

        merged = np.asarray(laser_mapping.merged_pose(self.matcher, L_now))

        # ---- pose-graph backend (Graph node, graph.cpp:301-378) -----------
        graph_pose = None
        new_keyframe = False
        loop_closed = False
        if self.graph is not None:
            if mo is not None and (mapping_success or len(self.graph.keyframes) == 0):
                with self.timer.stage("graph"):
                    kf_stamp = (
                        stamp if stamp is not None
                        else self._sweep_idx * cfg.registration.scan_period
                    )
                    new_keyframe = self.graph.add_frame(
                        kf_stamp, np.asarray(mo.W), mo.corner_ds, mo.surf_ds
                    )
                    if new_keyframe:
                        loop_closed = self.graph.detect_and_optimize() is not None
            graph_pose = (self.graph.T_odom2graph @ merged).astype(np.float32)
            self.graph_trajectory.append(graph_pose)

        # ---- UKF fusion: replay IMU predicts, correct with the solve ------
        if imu is not None and stamp is not None:
            if self._last_stamp is None:
                # filter birth: anchors the predict cool-down window
                self.ukf = dataclasses.replace(
                    self.ukf, init_stamp=jnp.float32(stamp)
                )
            t_from = self._last_stamp if self._last_stamp is not None else stamp - 0.1
            self.ukf = imu_queue.replay_predict(
                self.ukf, imu, jnp.float32(t_from), jnp.float32(stamp), cfg.ukf
            )
            dt = max(stamp - t_from, 1e-3)
            pos = merged[:3, 3]
            vel = (
                (pos - self._last_fused_pos) / dt
                if self._last_fused_pos is not None else np.zeros(3)
            )
            # correct only on sweeps where a map solve actually ran — the
            # reference's correct lives in transformUpdate, downstream of
            # optimizeTransform (LaserLocalization.cpp:140-166) — and in
            # mapping/local modes additionally only from ACCEPTED solves (a
            # failed gate would feed the filter an untrusted pose)
            solve_ran = mapping_success is not None
            if solve_ran and (mapping_success or self.mode == "localization"):
                self.ukf = imu_queue.correct_from_lidar(
                    self.ukf, jnp.asarray(merged, jnp.float32),
                    jnp.asarray(vel, jnp.float32), self.T_li, cfg.ukf,
                )
            self._last_fused_pos = pos
            self._last_stamp = stamp

        self._sweep_idx += 1
        self.trajectory.append(merged)
        self.odom_trajectory.append(np.asarray(L_now))
        return SweepResult(
            odom_pose=np.asarray(L_now),
            merged_pose=merged,
            mapped_pose=mapped_pose,
            mapping_success=mapping_success,
            odom_matched=int(odo_out.n_matched),
            graph_pose=graph_pose,
            new_keyframe=new_keyframe,
            loop_closed=loop_closed,
        )

    def corrected_trajectory(self) -> np.ndarray:
        """The graph-corrected trajectory so far: every merged pose re-read
        through the CURRENT odom->graph correction (what the reference's
        /aft_graph_to_init converges to after its last optimize)."""
        if self.graph is None:
            return np.stack(self.trajectory)
        T = self.graph.T_odom2graph
        return np.stack([T @ p for p in self.trajectory]).astype(np.float32)

    def save_map(self) -> None:
        """Flush the out-of-core map to disk (dynamic mode only)."""
        if self.dynamic:
            self.dmap.state = self.map_state
            self.dmap.save()

    def stats(self) -> dict:
        """Frame/solve accounting — the reference's destructor printouts
        (ScanMatch match/fail/averageScore, ScanMatch.cpp:35-49; frame
        counters, MultiScanRegistration.cpp:14-16; keyframe counters,
        keyframe_updater.hpp:17-19) as one queryable dict."""
        out = {
            "frames": self._sweep_idx,
            "mapping_solves": self._mapping_count,
            "match_count": self._match_count,
            "fail_match_count": self._fail_match_count,
            "average_score": (
                self._total_score / self._match_count
                if self._match_count else 0.0
            ),
        }
        if self.graph is not None:
            out["keyframes"] = len(self.graph.keyframes)
            out["loop_closures"] = len(self.graph.loops)
        return out

    def single_map_state(self) -> fm.FeatureMapState:
        """The map as a single-device FeatureMapState (de-striping the
        device-sharded map if one is in use) — the form map_io persists."""
        if self.map_mesh is not None:
            from ..maps import sharded_map as smap

            return smap.to_single(self.map_state, self.cfg.feature_map,
                                  self.map_mesh.devices.size)
        return self.map_state

    # ---- fusion outputs ---------------------------------------------------

    def fused_pose(self) -> np.ndarray:
        """Current UKF pose in the lidar frame."""
        return np.asarray(imu_queue.lidar_pose(self.ukf, self.T_li))

    def imu_rate_poses(self, imu: imu_queue.ImuBatch):
        """High-rate dead-reckoned pose trail from the latest merged pose
        (TransformMaintenance equivalent).  Returns (poses [M,4,4], valid)."""
        anchor = jnp.asarray(self.trajectory[-1], jnp.float32)
        vel = jnp.asarray(ukf_estimator.velocity(self.ukf))
        stamp = jnp.float32(self._last_stamp if self._last_stamp is not None else 0.0)
        poses, valid = transform_maintenance.imu_rate_poses(
            anchor, stamp, vel, imu, self.T_li
        )
        return np.asarray(poses), np.asarray(valid)
