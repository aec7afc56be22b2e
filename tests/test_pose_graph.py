import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.config import (
    KeyframeConfig, LoopConfig, PoseGraphConfig, RegistrationConfig, ScanMatchConfig,
)
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.models.graph import GraphSlam, KeyframeUpdater
from cooper_mapper_tpu.ops import features, pose_graph as pg
from cooper_mapper_tpu.utils import se3


PG_CFG = PoseGraphConfig(max_nodes=64, max_edges=128, max_iterations=30)


def _noisy_circle_graph(n=12, radius=5.0, drift=0.02, seed=0):
    """Ground-truth circle of poses; odometry edges with injected drift and
    one exact loop-closure edge from last to first."""
    rng = np.random.RandomState(seed)
    gt = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(se3.rot_y(jnp.array(ang)))
        T[0, 3] = radius * np.cos(ang)
        T[2, 3] = radius * np.sin(ang)
        gt.append(T)
    graph = pg.create(PG_CFG.max_nodes, PG_CFG.max_edges)
    # noisy odometry estimates via drifted relative transforms
    est = [gt[0]]
    slot = 0
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.asarray(
            se3.se3_exp(jnp.asarray(drift * rng.randn(6), jnp.float32))
        )
        rel_noisy = rel @ noise
        est.append(est[-1] @ rel_noisy)
        graph = pg.add_edge(
            graph, slot, k - 1, k, jnp.asarray(rel_noisy), jnp.ones(6)
        )
        slot += 1
    for k in range(n):
        graph = pg.add_node(graph, k, jnp.asarray(est[k]))
    # exact loop edge last -> first
    rel_loop = np.linalg.inv(gt[n - 1]) @ gt[0]
    graph = pg.add_edge(
        graph, slot, n - 1, 0, jnp.asarray(rel_loop), 2.0 * jnp.ones(6)
    )
    return graph, np.stack(gt), np.stack(est)


class TestPoseGraphLM:
    def test_residual_zero_at_truth(self):
        graph, gt, _ = _noisy_circle_graph(drift=0.0)
        r = pg.edge_residual(
            graph.poses[graph.edge_i[0]], graph.poses[graph.edge_j[0]], graph.edge_T[0]
        )
        np.testing.assert_allclose(r, np.zeros(6), atol=1e-4)

    def test_lm_reduces_cost_and_closes_loop(self):
        graph, gt, est = _noisy_circle_graph()
        out, diag = pg.optimize(graph, PG_CFG)
        assert float(diag["final_cost"]) < float(diag["initial_cost"]) * 0.2
        # loop closure should pull the last pose near the ground truth circle
        est_opt = np.asarray(out.poses[:12])
        err_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        err_after = np.linalg.norm(est_opt[-1][:3, 3] - gt[-1][:3, 3])
        assert err_after < err_before * 0.7, (err_before, err_after)

    def test_gauge_fixed_first_node(self):
        graph, gt, est = _noisy_circle_graph()
        out, _ = pg.optimize(graph, PG_CFG)
        np.testing.assert_allclose(out.poses[0], est[0], atol=1e-3)

    def test_masked_slots_untouched(self):
        graph, gt, est = _noisy_circle_graph()
        out, _ = pg.optimize(graph, PG_CFG)
        np.testing.assert_allclose(out.poses[20], np.eye(4), atol=1e-5)


class TestKeyframeUpdater:
    def test_gating(self):
        u = KeyframeUpdater(KeyframeConfig())
        p0 = np.eye(4, dtype=np.float32)
        assert u.update(p0)          # first always
        p1 = p0.copy(); p1[0, 3] = 0.1
        assert not u.update(p1)      # below 0.25 m
        p2 = p0.copy(); p2[0, 3] = 0.4
        assert u.update(p2)
        p3 = p2.copy()
        p3[:3, :3] = np.asarray(se3.rot_y(jnp.array(0.1)))
        assert u.update(p3)          # angle > 0.05 rad


@pytest.mark.slow
class TestGraphSlamLoop:
    def test_loop_closure_end_to_end(self):
        """Walk a square loop in the sim world; drift injected into 'odometry';
        the detector should close the loop and shrink final-pose error."""
        reg = RegistrationConfig(n_rings=16, max_points_per_ring=512)
        world = sim.make_room_world(size=(24.0, 4.0, 24.0), n_pillars=6, seed=3)

        # square path returning to start
        gt_poses = []
        side = 6.0
        waypoints = [
            (0, 0, 0.0), (side, 0, 0.0), (side, side, np.pi / 2),
            (0, side, np.pi), (0, 0, -np.pi / 2), (0, 0, 0.0),
        ]
        steps_per_leg = 4
        for (x0, z0, y0), (x1, z1, y1) in zip(waypoints[:-1], waypoints[1:]):
            for s in np.linspace(0, 1, steps_per_leg, endpoint=False):
                x, z = x0 + s * (x1 - x0), z0 + s * (z1 - z0)
                yaw = y0 + s * (y1 - y0)
                T = np.eye(4, dtype=np.float32)
                c, si = np.cos(yaw), np.sin(yaw)
                T[:3, :3] = np.array([[c, 0, si], [0, 1, 0], [-si, 0, c]])
                T[0, 3], T[1, 3], T[2, 3] = x - 3, 1.5, z - 3
                gt_poses.append(T)
        gt_poses.append(gt_poses[0])

        rng = np.random.RandomState(7)
        slam = GraphSlam(
            kf_cfg=KeyframeConfig(),
            loop_cfg=LoopConfig(
                distance_thresh=3.0, accum_distance_thresh=10.0, min_loop_interval=1.0
            ),
            pg_cfg=PG_CFG,
            sm_cfg=ScanMatchConfig(score_threshold=30.0,
                                   match_percentage_threshold=0.2),
        )
        odom = np.eye(4, dtype=np.float32)
        drift_per_step = np.asarray(
            se3.se3_exp(jnp.asarray([0.015, 0.0, 0.01, 0.0, 0.002, 0.0], jnp.float32))
        )
        loops_found = 0
        for i, T_gt in enumerate(gt_poses):
            Tj = jnp.asarray(T_gt)
            sweep = sim.scan_sweep(world, Tj, Tj, n_rings=16, width=512,
                                   distortion=False)
            fc = features.extract_features(sweep, reg)
            if i == 0:
                odom = T_gt.copy()
            else:
                rel = np.linalg.inv(gt_poses[i - 1]) @ T_gt
                odom = odom @ rel @ drift_per_step
            created = slam.add_frame(float(i), odom.copy(), fc.less_sharp, fc.less_flat)
            if created:
                if slam.detect_and_optimize() is not None:
                    loops_found += 1

        assert loops_found >= 1, "no loop closure found"
        est = slam.estimates()
        # final keyframe should be pulled toward its ground truth (start)
        drift_end = np.linalg.norm(slam.keyframes[-1].odom[:3, 3] - gt_poses[0][:3, 3])
        err_end = np.linalg.norm(est[len(slam.keyframes) - 1][:3, 3] - gt_poses[0][:3, 3])
        assert err_end < drift_end * 0.8, (drift_end, err_end)


class TestGraphSave:
    def test_save_and_rebuild(self, tmp_path):
        import os
        from cooper_mapper_tpu.config import MapConfig
        from cooper_mapper_tpu.io import map_io
        from cooper_mapper_tpu.utils import cloud as cloud_lib

        slam = GraphSlam(pg_cfg=PG_CFG)
        rng = np.random.RandomState(0)
        pose = np.eye(4, dtype=np.float32)
        for i in range(5):
            pts = jnp.asarray(rng.uniform(-3, 3, (64, 3)).astype(np.float32))
            c = cloud_lib.from_points(pts, capacity=64)
            pose = pose.copy()
            pose[0, 3] += 0.5
            slam.add_frame(float(i), pose, c, c)
        cfg_map = MapConfig(
            n_cubes=(5, 3, 5), cube_size=10.0,
            corner_cube_capacity=512, surf_cube_capacity=512,
            surround_corner_capacity=1024, surround_surf_capacity=1024,
            valid_distance=20.0,
        )
        slam.save(str(tmp_path), map_cfg=cfg_map)
        assert os.path.exists(tmp_path / "before.g2o")
        assert os.path.exists(tmp_path / "after.g2o")
        assert os.path.exists(tmp_path / "graph_traj.pcd")
        assert os.path.exists(tmp_path / "map" / "index.txt")
        poses2, edges2 = map_io.load_g2o(str(tmp_path / "after.g2o"))
        assert len(poses2) == len(slam.keyframes)


class TestPcgSolver:
    def test_cg_matches_dense_solution(self):
        """One LM step: the PCG update equals the dense solve."""
        graph, gt, est = _noisy_circle_graph(n=14, seed=2)
        lam = jnp.float32(1e-3)
        H, g = pg._assemble(graph, lam)
        dx_dense = -jnp.linalg.solve(H, g.reshape(-1, 1))[:, 0]
        H_ii, H_jj, H_ij, g2, _ = pg._edge_blocks(graph)
        np.testing.assert_allclose(np.asarray(g2.reshape(-1)), np.asarray(g),
                                   atol=1e-5)
        damp, M = pg._damping_terms(graph, H_ii, H_jj, lam)
        dx_cg = pg._pcg_solve(H_ii, H_jj, H_ij, graph.edge_i, graph.edge_j,
                              damp, M, g2, iters=400)
        np.testing.assert_allclose(np.asarray(dx_cg.reshape(-1)),
                                   np.asarray(dx_dense), atol=5e-4)

    def test_cg_optimize_closes_loop(self):
        graph, gt, est = _noisy_circle_graph(n=16, seed=3)
        cfg = dataclasses.replace(PG_CFG, solver="cg", pcg_iters=128)
        out, diag = pg.optimize(graph, cfg)
        assert float(diag["final_cost"]) < 0.05 * float(diag["initial_cost"])
        err = np.linalg.norm(
            np.asarray(out.poses[15][:3, 3]) - np.asarray(gt[15][:3, 3])
        )
        drift0 = np.linalg.norm(np.asarray(est[15][:3, 3]) - np.asarray(gt[15][:3, 3]))
        assert err < 0.5 * drift0

    def test_cg_scales_to_large_graph(self):
        """A 1500-node chain with loop closures — the dense [6N,6N] system
        would be 81M entries; the matrix-free path stays O(E)."""
        n = 1500
        rng = np.random.RandomState(4)
        graph = pg.create(n, 2 * n)
        gt = [np.eye(4, dtype=np.float32)]
        step = np.eye(4, dtype=np.float32)
        step[0, 3] = 1.0
        th = 2 * np.pi / n
        rot = np.array(
            [[np.cos(th), 0, np.sin(th), 0], [0, 1, 0, 0],
             [-np.sin(th), 0, np.cos(th), 0], [0, 0, 0, 1]], np.float32)
        for k in range(1, n):
            gt.append(gt[-1] @ step @ rot)
        est = [gt[0]]
        slot = 0
        for k in range(1, n):
            rel = np.linalg.inv(gt[k - 1]) @ gt[k]
            noise = np.eye(4, dtype=np.float32)
            noise[:3, 3] = 0.02 * rng.randn(3)
            rel_noisy = (rel @ noise).astype(np.float32)
            est.append((est[-1] @ rel_noisy).astype(np.float32))
            graph = pg.add_edge(graph, slot, k - 1, k, jnp.asarray(rel_noisy),
                                jnp.ones(6))
            slot += 1
        for k in range(n):
            graph = pg.add_node(graph, k, jnp.asarray(est[k]))
        # loop closures every 100 nodes back to the exact relative pose
        for k in range(100, n, 100):
            rel = (np.linalg.inv(gt[k - 100]) @ gt[k]).astype(np.float32)
            graph = pg.add_edge(graph, slot, k - 100, k, jnp.asarray(rel),
                                2.0 * jnp.ones(6))
            slot += 1
        cfg = dataclasses.replace(
            PG_CFG, max_nodes=n, max_edges=2 * n, solver="cg",
            pcg_iters=96, max_iterations=15,
        )
        out, diag = pg.optimize(graph, cfg)
        assert np.isfinite(float(diag["final_cost"]))
        assert float(diag["final_cost"]) < 0.2 * float(diag["initial_cost"])


class TestLoopCandidateGates:
    def _detector_and_frames(self, loop_cfg):
        from cooper_mapper_tpu.models.graph import Keyframe, LoopDetector
        from cooper_mapper_tpu.utils import cloud as cloud_lib

        det = LoopDetector(loop_cfg, ScanMatchConfig())
        dummy = cloud_lib.empty(8)

        def kf(accum):
            return Keyframe(0.0, np.eye(4, dtype=np.float32), dummy, dummy, accum)

        return det, kf

    def test_estimated_distance_gate(self):
        # plan-view SQUARED distance >= estimated_distance_thresh rejects the
        # candidate even inside the radius (loop_detector.hpp:135-137)
        cfg = LoopConfig(distance_thresh=50.0, estimated_distance_thresh=25.0,
                         accum_distance_thresh=10.0, min_loop_interval=0.0)
        det, kf = self._detector_and_frames(cfg)
        keyframes = [kf(0.0), kf(1.0), kf(100.0)]
        est = np.stack([np.eye(4, dtype=np.float32)] * 3)
        est[0][:3, 3] = [4.0, 0.0, 0.0]    # sq 16 < 25 -> candidate
        est[1][:3, 3] = [6.0, 0.0, 0.0]    # sq 36 >= 25 -> gated out
        est[2][:3, 3] = [0.0, 0.0, 0.0]
        cands = det.find_candidates(keyframes, est, 2)
        assert cands == [0]

    def test_y_flattened_distance(self):
        # vertical offset is ignored by the plan-view gate (pos.y = 0,
        # loop_detector.hpp:98-103)
        cfg = LoopConfig(distance_thresh=5.0, estimated_distance_thresh=25.0,
                         accum_distance_thresh=10.0, min_loop_interval=0.0)
        det, kf = self._detector_and_frames(cfg)
        keyframes = [kf(0.0), kf(100.0)]
        est = np.stack([np.eye(4, dtype=np.float32)] * 2)
        est[0][:3, 3] = [1.0, 40.0, 0.0]   # plan distance 1, y ignored
        cands = det.find_candidates(keyframes, est, 1)
        assert cands == [0]
