import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.config import (
    MapConfig, MatcherConfig, OdometryConfig, PipelineConfig, RegistrationConfig,
    ScanMatchConfig,
)
from cooper_mapper_tpu.io import evaluation, sim
from cooper_mapper_tpu.models.pipeline import SlamPipeline


def _small_cfg():
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
        mapping_stride=2,
    )


def _simulate(n_sweeps=10, width=768, speed=0.35, yaw_rate=0.02):
    world = sim.make_room_world(size=(30.0, 4.0, 40.0), n_pillars=8, seed=21)
    poses = [np.eye(4, dtype=np.float32)]
    poses[0][1, 3] = 1.5
    for i in range(n_sweeps):
        c, s = np.cos(yaw_rate), np.sin(yaw_rate)
        step = np.array(
            [[c, 0, s, 0.2 * speed], [0, 1, 0, 0], [-s, 0, c, speed], [0, 0, 0, 1]],
            np.float32,
        )
        poses.append(poses[-1] @ step)
    sweeps = [
        sim.scan_sweep(
            world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
            n_rings=16, width=width,
        )
        for i in range(n_sweeps)
    ]
    return sweeps, np.stack(poses[:n_sweeps])


class TestSlamPipeline:
    @pytest.fixture(scope="class")
    def run(self):
        sweeps, gt = _simulate()
        pipe = SlamPipeline(_small_cfg(), mode="mapping")
        results = [pipe.process(s) for s in sweeps]
        return pipe, results, gt

    def test_trajectory_tracks_ground_truth(self, run):
        pipe, results, gt = run
        est = np.stack([r.merged_pose for r in results])
        # ground truth poses are relative to the first pose's frame
        gt_rel = np.stack([np.linalg.inv(gt[0]) @ g for g in gt])
        stats = evaluation.ate(est[:, :3, 3], gt_rel[:, :3, 3])
        # cv_dewarp odometry holds per-sweep error at ~1 cm; the merged
        # trajectory lands well under 0.12 (was 0.25 with the s-model chain)
        assert stats.rmse < 0.12, f"ATE rmse {stats.rmse}: {est[:,:3,3] - gt_rel[:,:3,3]}"

    def test_odometry_close_to_mapping(self, run):
        pipe, results, gt = run
        odo = np.stack([r.odom_pose for r in results])
        merged = np.stack([r.merged_pose for r in results])
        # mapping correction should stay small in a well-tracked run
        assert np.linalg.norm(odo[-1][:3, 3] - merged[-1][:3, 3]) < 1.0

    def test_mapping_succeeds(self, run):
        pipe, results, gt = run
        ran = [r for r in results if r.mapping_success is not None]
        assert len(ran) >= 4
        assert any(r.mapping_success for r in ran[1:])

    def test_map_accumulates(self, run):
        pipe, results, gt = run
        total = int(jnp.sum(pipe.map_state.surf.count))
        assert total > 2000


class TestLocalPipeline:
    def test_local_mode_runs(self):
        sweeps, gt = _simulate(n_sweeps=6)
        pipe = SlamPipeline(_small_cfg(), mode="local")
        results = [pipe.process(s) for s in sweeps]
        est = np.stack([r.merged_pose for r in results])
        gt_rel = np.stack([np.linalg.inv(gt[0]) @ g for g in gt])
        stats = evaluation.ate(est[:, :3, 3], gt_rel[:, :3, 3])
        assert stats.rmse < 0.15, f"ATE rmse {stats.rmse}"


class TestEvaluation:
    def test_ate_zero_for_identical(self):
        pts = np.random.RandomState(0).randn(20, 3)
        stats = evaluation.ate(pts, pts)
        assert stats.rmse < 1e-12

    def test_umeyama_recovers_transform(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(50, 3)
        Rz = np.array(
            [[np.cos(0.4), -np.sin(0.4), 0], [np.sin(0.4), np.cos(0.4), 0], [0, 0, 1]]
        )
        moved = pts @ Rz.T + np.array([1.0, -2.0, 3.0])
        stats = evaluation.ate(pts, moved, align=True)
        assert stats.rmse < 1e-10

    def test_online_error_outlier_drop(self):
        est = np.zeros((10, 3))
        gt = np.zeros((10, 3))
        est[5] = [100, 0, 0]  # un-initialized spike
        stats = evaluation.online_error(est, gt)
        assert stats.n == 9
        assert stats.maximum < 1e-12


class TestImuFusion:
    def test_pipeline_with_imu(self):
        from cooper_mapper_tpu.fusion import imu_queue

        sweeps, gt = _simulate(n_sweeps=5)
        # the UKF corrects only on sweeps with an accepted map solve
        # (LaserLocalization.cpp:140-166) -> solve every sweep here; the
        # predict cool-down (tested in test_ukf) would skip this short run
        import dataclasses as _dc

        from cooper_mapper_tpu.config import UKFConfig

        cfg = _dc.replace(_small_cfg(), mapping_stride=1,
                          ukf=UKFConfig(cool_time_duration=0.0))
        pipe = SlamPipeline(cfg, mode="mapping")
        for i, s in enumerate(sweeps):
            stamp = 0.1 * (i + 1)
            stamps = jnp.linspace(stamp - 0.1, stamp, 10)
            imu = imu_queue.ImuBatch(
                stamp=stamps.astype(jnp.float32),
                acc=jnp.zeros((10, 3)),
                gyro=jnp.zeros((10, 3)),
                mask=jnp.ones(10, bool),
            )
            r = pipe.process(s, imu=imu, stamp=stamp)
        fused = pipe.fused_pose()
        # the fused pose should be near the merged SLAM pose
        assert np.linalg.norm(fused[:3, 3] - r.merged_pose[:3, 3]) < 0.5
        poses, valid = pipe.imu_rate_poses(imu)
        assert poses.shape == (10, 4, 4)
        assert np.all(np.isfinite(poses))


def test_stage_timer_accounts_stages():
    from cooper_mapper_tpu.utils import profiling

    t = profiling.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b", sync=lambda: jnp.ones(3)):
        pass
    assert t.calls["a"] == 2 and t.calls["b"] == 1
    rep = t.report()
    assert "a" in rep and "ms/call" in rep
    t.reset()
    assert not t.calls


class TestOnlineErrorMatching:
    def test_nearest_time_not_right_bracket(self):
        # est stamp 1.4 sits between gt stamps 1 and 2; the reference pairs
        # with the NEAREST stamp (1), not the right bracket (2)
        gt_t = np.array([0.0, 1.0, 2.0])
        gt = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        est = np.array([[1.0, 0, 0]])
        stats = evaluation.online_error(est, gt, est_stamp=[1.4], gt_stamp=gt_t)
        assert stats.maximum < 1e-12  # matched gt[1], not gt[2]

    def test_no_stamp_truncates(self):
        est = np.zeros((3, 3))
        gt = np.zeros((5, 3))
        stats = evaluation.online_error(est, gt)
        assert stats.n == 3


@pytest.mark.slow
class TestFigureEightRun:
    """Continuously-rotating trajectory (sim.figure_eight_trajectory): yaw
    sweeps through all headings and the path crosses itself — the shape the
    out-and-back corridor (test_long_run) and the circle (test_graph_pipeline)
    don't cover."""

    def test_mapping_tracks_figure_eight(self):
        world = sim.make_room_world(size=(30.0, 4.0, 40.0), n_pillars=8, seed=5)
        # 72 sweeps over 80% of the eight: <= 0.6 m / 12.5 deg per sweep
        # (n=36 peaks at 25 deg/sweep = 250 deg/s — no platform turns that fast)
        n = 72
        poses = sim.figure_eight_trajectory(n + 1, scale=6.0)
        pipe = SlamPipeline(_small_cfg(), mode="mapping")
        for i in range(n):
            sweep = sim.scan_sweep(
                world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
                n_rings=16, width=512,
            )
            pipe.process(sweep)
        est = np.stack(pipe.trajectory)
        # deliberately aggressive trajectory (up to 0.6 m + 12.5 deg PER
        # SWEEP with a continuously varying yaw rate — the constant-velocity
        # prior's worst case).  pipeline_ate encodes the end-of-sweep pose
        # convention + SE(3) gauge alignment; round 2's "mapping amplifies
        # odometry 2x" (0.76 vs 0.40) was exactly this evaluation indexed at
        # sweep STARTS without removing the unobservable map-frame gauge.
        # Measured: mapping 0.066 m vs odometry-only 0.451 m (aligned) —
        # mapping cuts drift ~7x.  Regression bound with margin:
        stats = evaluation.pipeline_ate(est, poses)
        assert stats.rmse < 0.15, f"figure-eight ATE rmse {stats.rmse}"
        # and mapping must stay strictly better than dead-reckoned odometry
        odo = np.stack(pipe.odom_trajectory)
        odo_stats = evaluation.pipeline_ate(odo, poses)
        assert stats.rmse < odo_stats.rmse, (
            f"mapping ({stats.rmse}) worse than odometry ({odo_stats.rmse})"
        )


class TestPipelineStats:
    def test_stats_accounting(self):
        """The destructor-counter report (ScanMatch.cpp:35-49 equivalent):
        frames, mapping solves, match/fail counts, average score."""
        sweeps, gt = _simulate(n_sweeps=6)
        pipe = SlamPipeline(_small_cfg(), mode="mapping")
        for s in sweeps:
            pipe.process(s)
        st = pipe.stats()
        assert st["frames"] == 6
        assert st["mapping_solves"] >= 3
        assert st["match_count"] + st["fail_match_count"] == st["mapping_solves"]
        if st["match_count"]:
            assert st["average_score"] > 0.0


class TestFusedSteps:
    """Single-dispatch fused sweep steps (models/fused.py): registration +
    odometry [+ mapping] in one jitted program with donated state tracks the
    same drive the staged pipeline does."""

    def test_fused_tracks_straight_drive(self):
        from cooper_mapper_tpu.models import fused

        cfg = PipelineConfig(
            registration=RegistrationConfig(
                n_rings=16, max_points_per_ring=512),
            scan_match=ScanMatchConfig(score_threshold=50.0),
            feature_map=MapConfig(
                n_cubes=(7, 3, 7), cube_size=20.0,
                corner_cube_capacity=1024, surf_cube_capacity=2048,
                surround_corner_capacity=8192,
                surround_surf_capacity=16384, valid_distance=60.0),
            matcher=MatcherConfig(max_frame_corner=2048,
                                  max_frame_surf=4096),
        )
        world = sim.make_room_world(size=(30.0, 4.0, 40.0), n_pillars=8,
                                    seed=31)
        p = np.eye(4, dtype=np.float32)
        p[1, 3] = 1.5
        step = np.eye(4, dtype=np.float32)
        step[2, 3] = 0.35
        st = fused.create(cfg)
        W = None
        for i in range(6):
            p2 = p @ step
            sw = sim.scan_sweep(world, jnp.asarray(p), jnp.asarray(p2),
                                n_rings=16, width=512)
            p = p2
            if i == 0:
                st = fused.init_sweep(st, sw, cfg)
            elif i % 2 == 0:
                st, W, ok = fused.mapping_sweep(st, sw, cfg)
            else:
                st, W, nm = fused.odometry_sweep(st, sw, cfg)
        pos = np.asarray(W)[:3, 3]
        gt = np.array([0.0, 0.0, 0.35 * 5])
        assert np.linalg.norm(pos - gt) < 0.3, (pos, gt)
        assert int(jnp.sum(st.map.surf.count)) > 0
