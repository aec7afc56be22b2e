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


class TestBucketedOdometry:
    """Capacity-bucketed heterogeneous dispatch (BASELINE config 5's
    production shape: distinct per-problem cloud sizes)."""

    def _hetero_batch(self, B=6):
        """Problems with deliberately different valid counts inside
        generous shared capacities."""
        from cooper_mapper_tpu.utils import cloud as cloud_lib

        m1 = to._pose(x=0.25, y=0.0, z=0.35)
        fp, fc, _ = to._sweep_pair(jnp.asarray(m1))

        def shrink(c, keep):
            """Keep only the first ``keep`` valid points (mask the rest)."""
            rank = jnp.cumsum(c.mask.astype(jnp.int32)) - 1
            m = c.mask & (rank < keep)
            return cloud_lib.Cloud(
                jnp.where(m[:, None], c.xyz, cloud_lib.FAR), m, c.ring,
                c.rel_time)

        keeps = [1.0, 1.0, 0.6, 0.6, 0.25, 0.25][:B]
        packs = []
        for kf in keeps:
            packs.append(tuple(
                shrink(c, max(int(kf * int(c.count())), 40))
                for c in (fc.sharp, fc.flat, fp.less_sharp, fp.less_flat)
            ))
        stack = lambda i: jax.tree.map(
            lambda *xs: jnp.stack(xs), *[p[i] for p in packs])
        return stack(0), stack(1), stack(2), stack(3)

    def test_matches_full_capacity_solve(self):
        sharp, flat, ref_c, ref_s = self._hetero_batch()
        B = sharp.mask.shape[0]
        cfg = OdometryConfig(max_iterations=8)
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(0.02 * rng.randn(B, 6), jnp.float32)

        xb, stb = pbatch.bucketed_odometry_solve(
            sharp, flat, ref_c, ref_s, x0, cfg, granule=128, chunk=4)
        xf, stf = oo.batch_odometry_solve(sharp, flat, ref_c, ref_s, x0, cfg)
        # same correspondences, different pad-summation order -> tight atol
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xf), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(stb.n_matched),
                                      np.asarray(stf.n_matched))

        # scatter the reference masks (NOT front-packed): the dispatch must
        # fall back to the vmapped compact and still match
        rng2 = np.random.RandomState(7)
        perm = rng2.permutation(ref_s.capacity)
        ref_s_scat = jax.tree.map(lambda a: a[:, perm], ref_s)
        xb2, _ = pbatch.bucketed_odometry_solve(
            sharp, flat, ref_c, ref_s_scat, x0, cfg, granule=128, chunk=4)
        np.testing.assert_allclose(np.asarray(xb2), np.asarray(xf), atol=2e-4)

    def test_bucket_signatures_and_order(self):
        """Distinct sizes land in distinct buckets; results come back in
        input order even when buckets reorder execution."""
        sharp, flat, ref_c, ref_s = self._hetero_batch()
        counts = np.asarray(jax.device_get(ref_s.count()))
        caps = [pbatch._bucket_cap(int(n), 128) for n in counts]
        assert len(set(caps)) >= 2, caps
        B = sharp.mask.shape[0]
        cfg = OdometryConfig(max_iterations=4)
        x0 = jnp.asarray(0.02 * np.random.RandomState(1).randn(B, 6),
                         jnp.float32)
        xb, _ = pbatch.bucketed_odometry_solve(
            sharp, flat, ref_c, ref_s, x0, cfg, granule=128, chunk=4)
        # spot-check first/last against the unbatched single solve
        for p in [0, B - 1]:
            take = lambda t: jax.tree.map(lambda a: a[p], t)
            xs, _ = oo.odometry_solve(
                take(sharp), take(flat), take(ref_c), take(ref_s), x0[p], cfg)
            np.testing.assert_allclose(np.asarray(xb[p]), np.asarray(xs),
                                       atol=2e-4)


def test_shared_ref_odometry_matches_broadcast():
    """batch_odometry_solve with unbatched (shared) reference clouds is
    bit-identical to broadcasting them across the batch."""
    from cooper_mapper_tpu.utils import cloud as cloud_lib

    rng = np.random.RandomState(0)

    def mk(n):
        return cloud_lib.make(
            jnp.asarray(rng.randn(n, 3), jnp.float32) * 4,
            jnp.ones(n, bool),
            jnp.asarray(rng.randint(0, 16, n), jnp.int32),
            jnp.asarray(rng.rand(n), jnp.float32))

    sharp, flat, rc, rs = mk(64), mk(256), mk(256), mk(1024)
    B = 3
    tile = lambda c: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), c)
    x0 = jnp.asarray(0.02 * rng.randn(B, 6), jnp.float32)
    cfg = OdometryConfig(max_iterations=6)
    xs_shared, _ = oo.batch_odometry_solve(tile(sharp), tile(flat), rc, rs,
                                           x0, cfg)
    xs_bcast, _ = oo.batch_odometry_solve(tile(sharp), tile(flat), tile(rc),
                                          tile(rs), x0, cfg)
    np.testing.assert_array_equal(np.asarray(xs_shared), np.asarray(xs_bcast))
