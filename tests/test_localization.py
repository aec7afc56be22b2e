"""Localization-mode coverage: LaserLocalization as an automated test.

The reference's relocalization flow (/root/reference/L_SLAM/src/odometry/
LaserLocalization.cpp:27-171): seed from an initial pose (initialpose/GNSS,
:39-110), match incoming sweeps against a FIXED pre-built map with no map
updates (:124-138), commit the solved pose only on a passing score gate and
dead-reckon on failure (:140-166).  BASELINE config 3 names this mode.

Covered here end-to-end on the sim world (CPU-sized):
* map build -> save -> reload roundtrip (map_io) feeding localization,
* recovery from a PERTURBED seed (seed error shrinks to cm-level ATE),
* the no-map-update invariant (the map object is never replaced or written),
* gate-failure dead-reckoning (localization_step falls back to the merge
  guess, unlike mapping's commit policy),
* the UKF wired downstream of the localization solve (fused pose tracks).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.config import (
    MapConfig, MatcherConfig, PipelineConfig, RegistrationConfig,
    ScanMatchConfig, UKFConfig,
)
from cooper_mapper_tpu.fusion import imu_queue
from cooper_mapper_tpu.io import map_io, sim
from cooper_mapper_tpu.models import laser_mapping
from cooper_mapper_tpu.models.pipeline import SlamPipeline
from cooper_mapper_tpu.utils import se3


def _cfg():
    return PipelineConfig(
        registration=RegistrationConfig(n_rings=16, max_points_per_ring=512),
        scan_match=ScanMatchConfig(score_threshold=50.0),
        feature_map=MapConfig(
            n_cubes=(7, 3, 7), cube_size=20.0,
            corner_cube_capacity=1024, surf_cube_capacity=2048,
            surround_corner_capacity=8192, surround_surf_capacity=16384,
            valid_distance=60.0,
        ),
        matcher=MatcherConfig(max_frame_corner=2048, max_frame_surf=4096),
        mapping_stride=1,
        ukf=UKFConfig(cool_time_duration=0.0),
    )


def _drive(start, n, speed=0.4):
    poses = [start]
    step = np.eye(4, dtype=np.float32)
    step[2, 3] = speed
    for _ in range(n):
        poses.append(poses[-1] @ step)
    return poses


def _sweeps(world, poses):
    return [
        sim.scan_sweep(world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
                       n_rings=16, width=512)
        for i in range(len(poses) - 1)
    ]


@pytest.fixture(scope="module")
def built_map(tmp_path_factory):
    """Mapping run -> saved cube manifest on disk (the localization input)."""
    cfg = _cfg()
    world = sim.make_room_world(size=(30.0, 4.0, 40.0), n_pillars=8, seed=23)
    start = np.eye(4, dtype=np.float32)
    start[1, 3] = 1.5
    poses = _drive(start, 8)
    mapper = SlamPipeline(cfg, mode="mapping")
    for s in _sweeps(world, poses):
        mapper.process(s)
    map_dir = str(tmp_path_factory.mktemp("loc_map"))
    n_cubes = map_io.save_feature_map(mapper.map_state, cfg.feature_map, map_dir)
    assert n_cubes > 0
    return dict(cfg=cfg, world=world, start=start, map_poses=poses,
                map_dir=map_dir)


class TestLocalization:
    @pytest.fixture(scope="class")
    def loc_run(self, built_map):
        """Offset second drive relocalized against the reloaded map with a
        PERTURBED seed and the UKF in the loop."""
        cfg = built_map["cfg"]
        loc_map = map_io.load_feature_map(built_map["map_dir"],
                                          cfg.feature_map)
        start = built_map["start"]
        start2 = start.copy()
        start2[0, 3] += 0.8                  # off the mapping trajectory
        poses2 = _drive(start2, 6)
        # true seed (map frame = first mapping pose frame) perturbed by
        # 0.3 m / ~2 deg yaw — the initialpose a user clicks is never exact
        seed_true = start2 @ np.linalg.inv(start)
        c, s = np.cos(0.035), np.sin(0.035)
        perturb = np.array(
            [[c, 0, s, 0.3], [0, 1, 0, -0.1], [-s, 0, c, 0.2], [0, 0, 0, 1]],
            np.float32,
        )
        seed = (seed_true @ perturb).astype(np.float32)

        pipe = SlamPipeline(cfg, mode="localization", map_state=loc_map,
                            initial_pose=seed)
        map_state_before = pipe.map_state
        results = []
        for i, sw in enumerate(_sweeps(built_map["world"], poses2)):
            stamp = 0.1 * (i + 1)
            stamps = jnp.linspace(stamp - 0.1, stamp, 10)
            imu = imu_queue.ImuBatch(
                stamp=stamps.astype(jnp.float32),
                acc=jnp.zeros((10, 3)),
                gyro=jnp.zeros((10, 3)),
                mask=jnp.ones(10, bool),
            )
            results.append(pipe.process(sw, imu=imu, stamp=stamp))
        return dict(pipe=pipe, results=results, poses2=poses2,
                    map_state_before=map_state_before, seed=seed,
                    seed_true=seed_true)

    def test_seed_recovered(self, built_map, loc_run):
        """The 0.3 m perturbed seed converges to cm-level localization."""
        gt0 = built_map["map_poses"][0]
        errs = []
        for i, r in enumerate(loc_run["results"]):
            if r.mapping_success is None:
                continue
            gt_rel = np.linalg.inv(gt0) @ loc_run["poses2"][i]
            errs.append(np.linalg.norm(r.merged_pose[:3, 3] - gt_rel[:3, 3]))
        assert len(errs) >= 4
        seed_err = np.linalg.norm(
            loc_run["seed"][:3, 3] - loc_run["seed_true"][:3, 3]
        )
        # recovered: steady-state error far below the injected seed error
        steady = float(np.mean(errs[2:]))
        assert steady < 0.12, f"errors {errs} (seed error {seed_err:.3f})"
        assert steady < 0.5 * seed_err

    def test_solves_accepted(self, loc_run):
        ran = [r for r in loc_run["results"] if r.mapping_success is not None]
        assert len(ran) >= 4
        assert sum(r.mapping_success for r in ran) >= len(ran) - 1

    def test_no_map_update_invariant(self, loc_run):
        """localization_step must never write the map: the pipeline's map
        object is the very object it started with (LaserLocalization has no
        featureMapUpdate, LaserLocalization.cpp:124-138)."""
        assert loc_run["pipe"].map_state is loc_run["map_state_before"]

    def test_ukf_fused_tracks_solution(self, loc_run):
        fused = loc_run["pipe"].fused_pose()
        merged = loc_run["results"][-1].merged_pose
        assert np.all(np.isfinite(fused))
        assert np.linalg.norm(fused[:3, 3] - merged[:3, 3]) < 0.5


class TestGateFailureDeadReckon:
    def test_rejected_solve_keeps_merge_guess(self, built_map):
        """An impossible score threshold forces gate failure: the committed
        pose must be EXACTLY the dead-reckoned merge guess
        (transform_associate of the odometry delta onto W_last), the
        treatment LaserLocalization.cpp:140-166 gives a failed gate."""
        cfg = built_map["cfg"]
        loc_map = map_io.load_feature_map(built_map["map_dir"], cfg.feature_map)
        sm_cfg = dataclasses.replace(cfg.scan_match, score_threshold=1e9)

        world = built_map["world"]
        start = built_map["start"]
        poses = _drive(start, 2)
        sw = _sweeps(world, poses)[1]
        from cooper_mapper_tpu.ops import features as feat_ops
        fc = feat_ops.extract_features(sw, cfg.registration)

        L_last = jnp.eye(4, dtype=jnp.float32)
        W_last = jnp.asarray(np.diag([1, 1, 1, 1]).astype(np.float32))
        W_last = W_last.at[2, 3].set(0.4)
        matcher = laser_mapping.MatcherState(L_last=L_last, W_last=W_last)
        L_now = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(0.42)

        matcher2, mo = laser_mapping.localization_step(
            matcher, loc_map, fc.less_sharp, fc.less_flat, L_now,
            sm_cfg, cfg.matcher, cfg.feature_map,
        )
        assert not bool(mo.result.success)
        T_guess = se3.transform_associate(L_last, L_now, W_last)
        np.testing.assert_allclose(np.asarray(mo.W), np.asarray(T_guess),
                                   atol=1e-6)
        # and the matcher chain advances on the dead-reckoned pose
        np.testing.assert_allclose(np.asarray(matcher2.W_last),
                                   np.asarray(T_guess), atol=1e-6)

    def test_seed_localization_resets_chain(self):
        """seed_localization == the initialpose handler: W_last jumps to the
        seed and L_last anchors at the current odometry pose."""
        m = laser_mapping.create_matcher()
        pose = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(5.0)
        L_now = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(1.0)
        m2 = laser_mapping.seed_localization(m, pose, L_now)
        np.testing.assert_array_equal(np.asarray(m2.W_last), np.asarray(pose))
        np.testing.assert_array_equal(np.asarray(m2.L_last), np.asarray(L_now))
        # the merged pose at the seeding instant is exactly the seed
        np.testing.assert_allclose(
            np.asarray(laser_mapping.merged_pose(m2, L_now)),
            np.asarray(pose), atol=1e-6,
        )
