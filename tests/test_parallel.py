import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.config import OdometryConfig, PoseGraphConfig
from cooper_mapper_tpu.ops import odometry as oo
from cooper_mapper_tpu.ops import pose_graph as pg
from cooper_mapper_tpu.parallel import batch as pbatch
from cooper_mapper_tpu.parallel import mesh as pmesh

import test_odometry as to
import test_pose_graph as tpg


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pmesh.make_mesh(8)


class TestShardedOdometry:
    def test_matches_unsharded(self, mesh8):
        m1 = to._pose(x=0.25, y=0.0, z=0.35)
        fp, fc, _ = to._sweep_pair(jnp.asarray(m1))
        B = 8
        tile = lambda t: jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), t
        )
        xs, st = pbatch.sharded_odometry_solve(
            tile(fc.sharp), tile(fc.flat), tile(fp.less_sharp), tile(fp.less_flat),
            jnp.zeros((B, 6)), OdometryConfig(), mesh8,
        )
        x_single, _ = oo.odometry_solve(
            fc.sharp, fc.flat, fp.less_sharp, fp.less_flat, jnp.zeros(6),
            OdometryConfig(),
        )
        for b in range(B):
            np.testing.assert_allclose(xs[b], x_single, atol=1e-4)


class TestShardedPoseGraph:
    def test_matches_dense(self, mesh8):
        cfg = PoseGraphConfig(max_nodes=64, max_edges=128, max_iterations=15)
        graph, gt, est = tpg._noisy_circle_graph()
        out_dense, diag_dense = pg.optimize(graph, cfg)
        out_shard, diag_shard = pbatch.sharded_pose_graph_optimize(
            graph, cfg, pmesh.make_mesh(8)
        )
        assert float(diag_shard["final_cost"]) < float(diag_shard["initial_cost"]) * 0.2
        np.testing.assert_allclose(
            diag_shard["initial_cost"], diag_dense["initial_cost"], rtol=1e-4
        )
        np.testing.assert_allclose(
            out_shard.poses[:12], out_dense.poses[:12], atol=5e-3
        )


class TestShardedPoseGraphCg:
    def test_cg_matches_dense_sharded(self, mesh8):
        import dataclasses

        cfg = PoseGraphConfig(max_nodes=64, max_edges=128, max_iterations=15)
        graph, gt, est = tpg._noisy_circle_graph(seed=5)
        out_dense, diag_dense = pbatch.sharded_pose_graph_optimize(
            graph, cfg, mesh8
        )
        cfg_cg = dataclasses.replace(cfg, solver="cg", pcg_iters=128)
        out_cg, diag_cg = pbatch.sharded_pose_graph_optimize(
            graph, cfg_cg, mesh8
        )
        np.testing.assert_allclose(
            diag_cg["initial_cost"], diag_dense["initial_cost"], rtol=1e-4
        )
        assert float(diag_cg["final_cost"]) < 0.2 * float(diag_cg["initial_cost"])
        np.testing.assert_allclose(
            out_cg.poses[:12, :3, 3], out_dense.poses[:12, :3, 3], atol=1e-2
        )
