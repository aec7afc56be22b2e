import jax
import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.config import MapConfig, RegistrationConfig, ScanMatchConfig
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.maps import feature_map as fm
from cooper_mapper_tpu.ops import features, scan_match
from cooper_mapper_tpu.ops.odometry import _reference_jacobian_rows
from cooper_mapper_tpu.utils import cloud as cloud_lib
from cooper_mapper_tpu.utils import se3, twist


CFG_REG = RegistrationConfig(n_rings=16, max_points_per_ring=512)
CFG_SM = ScanMatchConfig(score_threshold=50.0)  # synthetic scenes are sparser
KEY = jax.random.PRNGKey(0)


def _pose_mat(x=0.0, y=1.5, z=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    return jnp.array(
        [[c, 0, s, x], [0, 1, 0, y], [-s, 0, c, z], [0, 0, 0, 1]], jnp.float32
    )


def _world_features(pose, world, width=512):
    """Features of a static sweep, registered into the world frame."""
    sweep = sim.scan_sweep(world, pose, pose, n_rings=16, width=width, distortion=False)
    fc = features.extract_features(sweep, CFG_REG)

    def to_world(c):
        xyz = se3.apply(pose, c.xyz)
        return cloud_lib.Cloud(
            jnp.where(c.mask[:, None], xyz, cloud_lib.FAR), c.mask, c.ring, c.rel_time
        )

    return fc, to_world


class TestJacobian:
    def test_closed_form_matches_autodiff(self):
        x = jnp.array([0.05, -0.1, 0.2, 1.0, -2.0, 0.5])
        pts = jax.random.normal(KEY, (32, 3)) * 10
        coeff = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        J_ref = _reference_jacobian_rows(x, pts, coeff)
        dW = jax.jacfwd(lambda xx: twist.point_to_map(xx, pts))(x)  # [N,3,6]
        J_ad = jnp.einsum("ni,nio->no", coeff, dW)
        np.testing.assert_allclose(J_ref, J_ad, atol=1e-4)


class TestScanMatch:
    def test_recovers_pose_offset(self):
        # the map accumulates several sweeps (as LaserMapping does) so that
        # scan rings interleave and plane fits are well determined; a
        # single-sweep "map" leaves floor planes collinear-degenerate
        world = sim.make_room_world(seed=11)
        ref_clouds = []
        for pose in [_pose_mat(), _pose_mat(x=1.0, z=0.7), _pose_mat(x=-0.8, z=1.2, yaw=0.3)]:
            fc_r, to_world = _world_features(pose, world)
            ref_clouds.append((to_world(fc_r.less_sharp), to_world(fc_r.less_flat)))
        ref_corner = cloud_lib.compact(
            ref_clouds[0][0], 4096
        )
        from cooper_mapper_tpu.utils.cloud import concat
        ref_corner = concat(concat(ref_clouds[0][0], ref_clouds[1][0]), ref_clouds[2][0])
        ref_surf = concat(concat(ref_clouds[0][1], ref_clouds[1][1]), ref_clouds[2][1])

        true_pose = _pose_mat(x=0.4, z=-0.3, yaw=0.04)
        fc_cur, _ = _world_features(true_pose, world)

        # start from a perturbed initial guess
        x0 = twist.from_mat(true_pose @ se3.euler6_to_mat(
            jnp.array([0.01, 0.02, -0.01, 0.15, -0.1, 0.1])
        ))
        # the mapper matches the downsampled less_* stacks (LaserMatcher::
        # prepareFeatureFrame) — the tiny sharp/flat clouds alone would fall
        # below the eigen-100 degeneracy threshold
        res = scan_match.scan_match(
            fc_cur.less_sharp, fc_cur.less_flat, ref_corner, ref_surf, x0, CFG_SM
        )
        T_est = twist.to_mat(res.x)
        err = np.array(se3.se3_log(se3.inverse(true_pose) @ T_est))
        # bounded by voxel-centroid quantization at the coarse 512-column
        # test resolution (0.2/0.4 m leaves); denser sweeps tighten this
        assert np.linalg.norm(err[:3]) < 0.1, f"trans {err}"
        assert np.linalg.norm(err[3:]) < 0.01
        assert bool(res.converged)
        assert float(res.match_fraction) > 0.3

    def test_gate_rejects_garbage(self):
        world = sim.make_room_world(seed=11)
        fc_ref, to_world = _world_features(_pose_mat(), world)
        # reference = random junk far away
        junk = cloud_lib.from_points(
            100.0 + 5.0 * jax.random.normal(KEY, (512, 3)), capacity=512
        )
        res = scan_match.scan_match(
            fc_ref.sharp, fc_ref.flat, junk, junk, jnp.zeros(6), CFG_SM
        )
        assert not bool(res.success)


class TestFeatureMap:
    CFG = MapConfig(
        n_cubes=(7, 3, 7),
        cube_size=10.0,
        corner_cube_capacity=256,
        surf_cube_capacity=512,
        surround_corner_capacity=2048,
        surround_surf_capacity=4096,
        valid_distance=30.0,
    )

    def test_insert_and_gather(self):
        state = fm.create(self.CFG)
        pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [12.0, 0, 0], [-8.0, 1.0, 3.0]])
        c = cloud_lib.from_points(pts, capacity=8)
        state = fm.add_feature_cloud(state, c, c, self.CFG)
        corner, surf = fm.get_surround(state, jnp.zeros(3), self.CFG)
        assert int(corner.count()) == 4
        got = np.sort(np.array(corner.xyz[np.array(corner.mask)])[:, 0])
        np.testing.assert_allclose(got, [-8, 0, 1, 12], atol=1e-5)

    def test_cube_capacity_overflow_drops(self):
        state = fm.create(self.CFG)
        pts = jnp.zeros((600, 3))  # one cube, capacity 256
        c = cloud_lib.from_points(pts)
        state = fm.add_feature_cloud(state, c, c, self.CFG)
        assert int(jnp.max(state.corner.count)) == 256
        assert int(jnp.sum(state.corner.count)) == 256

    def test_recenter_preserves_world_positions(self):
        state = fm.create(self.CFG)
        pts = jnp.array([[0.0, 0, 0], [25.0, 0, 0]])
        c = cloud_lib.from_points(pts, capacity=4)
        state = fm.add_feature_cloud(state, c, c, self.CFG)
        # move sensor far +x so the grid must shift
        state = fm.recenter(state, jnp.array([30.0, 0.0, 0.0]), self.CFG)
        corner, _ = fm.get_surround(state, jnp.array([30.0, 0.0, 0.0]), self.CFG)
        kept = np.array(corner.xyz[np.array(corner.mask)])
        # the 25 m point should survive recentring at its original world coords
        assert any(np.allclose(p, [25, 0, 0], atol=1e-4) for p in kept)

    def test_recenter_drops_out_of_window(self):
        state = fm.create(self.CFG)
        pts = jnp.array([[-30.0, 0, 0]])
        c = cloud_lib.from_points(pts, capacity=4)
        state = fm.add_feature_cloud(state, c, c, self.CFG)
        state = fm.recenter(state, jnp.array([40.0, 0.0, 0.0]), self.CFG)
        total = int(jnp.sum(state.corner.count))
        assert total == 0

    def test_dedup_merges(self):
        state = fm.create(self.CFG)
        pts = jnp.zeros((100, 3)) + jnp.array([[0.01, 0, 0]]) * jnp.arange(100)[:, None]
        c = cloud_lib.from_points(pts)  # 100 points inside ~0.2 m
        state = fm.add_feature_cloud(state, c, c, self.CFG)
        state = fm.dedup_active(state, jnp.zeros(3), self.CFG)
        assert int(jnp.sum(state.corner.count)) <= 6  # 1 m span / 0.2 leaf
        assert int(jnp.sum(state.surf.count)) <= 3    # 0.4 leaf

    def test_mapping_against_accumulated_map(self):
        # end-to-end: insert world features from one pose, localize another
        world = sim.make_room_world(seed=5)
        state = fm.create(MapConfig(
            n_cubes=(5, 3, 5), cube_size=20.0,
            corner_cube_capacity=1024, surf_cube_capacity=2048,
            surround_corner_capacity=4096, surround_surf_capacity=8192,
            valid_distance=40.0,
        ))
        cfg_map = MapConfig(
            n_cubes=(5, 3, 5), cube_size=20.0,
            corner_cube_capacity=1024, surf_cube_capacity=2048,
            surround_corner_capacity=4096, surround_surf_capacity=8192,
            valid_distance=40.0,
        )
        for pose in [_pose_mat(), _pose_mat(x=1.2, z=0.6), _pose_mat(x=-0.5, z=1.4, yaw=0.2)]:
            fc_ref, to_world = _world_features(pose, world)
            state = fm.add_feature_cloud(
                state, to_world(fc_ref.less_sharp), to_world(fc_ref.less_flat), cfg_map
            )
        ref_corner, ref_surf = fm.get_surround(state, jnp.zeros(3), cfg_map)

        true_pose = _pose_mat(x=0.3, z=0.2, yaw=-0.03)
        fc_cur, _ = _world_features(true_pose, world)
        x0 = twist.from_mat(_pose_mat())  # no initial motion knowledge
        res = scan_match.scan_match(
            fc_cur.less_sharp, fc_cur.less_flat, ref_corner, ref_surf, x0, CFG_SM
        )
        T_est = twist.to_mat(res.x)
        err = np.array(se3.se3_log(se3.inverse(true_pose) @ T_est))
        assert np.linalg.norm(err[:3]) < 0.08, f"{err}"
        assert np.linalg.norm(err[3:]) < 0.02
