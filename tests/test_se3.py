import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.utils import se3, twist


KEY = jax.random.PRNGKey(0)


def rand_euler6(key, n=16, rot_scale=0.5, trans_scale=3.0):
    kr, kt = jax.random.split(key)
    r = rot_scale * jax.random.uniform(kr, (n, 3), minval=-1, maxval=1)
    t = trans_scale * jax.random.uniform(kt, (n, 3), minval=-1, maxval=1)
    return jnp.concatenate([r, t], -1)


class TestEuler:
    def test_roundtrip(self):
        x = rand_euler6(KEY)
        x2 = se3.mat_to_euler6(se3.euler6_to_mat(x))
        np.testing.assert_allclose(x, x2, atol=1e-5)

    def test_rotation_orthonormal(self):
        x = rand_euler6(KEY)
        R = se3.euler6_to_mat(x)[..., :3, :3]
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)

    def test_inverse(self):
        x = rand_euler6(KEY)
        T = se3.euler6_to_mat(x)
        eye = jnp.broadcast_to(jnp.eye(4), T.shape)
        np.testing.assert_allclose(T @ se3.inverse(T), eye, atol=1e-5)

    def test_rotate_zxy_matches_reference_order(self):
        # rotateZXY(p, az, ax, ay) applies rotZ first then rotX then rotY
        # (math_utils.h:184-205): p' = Ry @ Rx @ Rz @ p
        p = jax.random.normal(KEY, (7, 3))
        az, ax, ay = 0.3, -0.2, 0.7
        manual = (se3.rot_y(ay) @ se3.rot_x(ax) @ se3.rot_z(az) @ p[..., None])[..., 0]
        np.testing.assert_allclose(se3.rotate_zxy(p, az, ax, ay), manual, atol=1e-6)

    def test_zyx_euler_against_scipy_convention(self):
        # TZYX = intrinsic z-y-x = scipy 'ZYX' with angles (rz, ry, rx)
        pytest.importorskip("scipy")
        from scipy.spatial.transform import Rotation

        rx, ry, rz = 0.1, -0.4, 1.2
        R = se3.euler_zyx_to_rot(jnp.array(rx), jnp.array(ry), jnp.array(rz))
        R_ref = Rotation.from_euler("ZYX", [rz, ry, rx]).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-6)


class TestTransformAssociate:
    def test_identity_correction(self):
        # if W_old == L_old then W_new == L_new
        x = rand_euler6(KEY, 4)
        L_old = se3.euler6_to_mat(x[0])
        L_new = se3.euler6_to_mat(x[1])
        W_new = se3.transform_associate(L_old, L_new, L_old)
        np.testing.assert_allclose(W_new, L_new, atol=1e-5)

    def test_correction_preserved(self):
        # the odom->map correction is constant: W_new L_new^-1 == W_old L_old^-1
        x = rand_euler6(KEY, 4)
        L_old, L_new, W_old = (se3.euler6_to_mat(x[i]) for i in range(3))
        W_new = se3.transform_associate(L_old, L_new, W_old)
        np.testing.assert_allclose(
            W_new @ se3.inverse(L_new), W_old @ se3.inverse(L_old), atol=1e-5
        )


class TestLieOps:
    def test_se3_exp_log_roundtrip(self):
        xi = 0.5 * jax.random.normal(KEY, (32, 6))
        xi2 = se3.se3_log(se3.se3_exp(xi))
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_so3_exp_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        R = se3.so3_exp(w)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)
        assert jnp.all(jnp.isfinite(R))

    def test_exp_matches_euler_first_order(self):
        eps = 1e-3
        xi = jnp.array([0.0, 0, 0, eps, 0, 0])  # rotation about x
        T = se3.se3_exp(jnp.array([0, 0, 0, eps, 0, 0.0])[None])[0]
        # translation-first twist packing: [v, w]
        T2 = se3.se3_exp(jnp.concatenate([jnp.zeros(3), jnp.array([eps, 0, 0])]))
        np.testing.assert_allclose(T2[:3, :3], se3.rot_x(jnp.array(eps)), atol=1e-6)


class TestQuat:
    def test_quat_rot_roundtrip(self):
        x = rand_euler6(KEY)
        R = se3.euler6_to_mat(x)[..., :3, :3]
        R2 = se3.quat_to_rot(se3.rot_to_quat(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_slerp_endpoints(self):
        q0 = se3.rot_to_quat(se3.rot_x(jnp.array(0.3)))
        q1 = se3.rot_to_quat(se3.rot_y(jnp.array(1.0)))
        np.testing.assert_allclose(se3.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
        np.testing.assert_allclose(se3.quat_slerp(q0, q1, 1.0), q1, atol=1e-5)

    def test_quat_multiply_vs_rot(self):
        x = rand_euler6(KEY, 2)
        Ra = se3.euler6_to_mat(x[0])[:3, :3]
        Rb = se3.euler6_to_mat(x[1])[:3, :3]
        qa, qb = se3.rot_to_quat(Ra), se3.rot_to_quat(Rb)
        np.testing.assert_allclose(
            se3.quat_to_rot(se3.quat_multiply(qa, qb)), Ra @ Rb, atol=1e-5
        )


class TestTwistWarps:
    def test_warp_to_start_zero_motion(self):
        p = jax.random.normal(KEY, (10, 3))
        s = jnp.linspace(0, 1, 10)
        out = twist.warp_to_start(jnp.zeros(6), p, s)
        np.testing.assert_allclose(out, p, atol=1e-6)

    def test_warp_full_s_is_forward_tzyx(self):
        # At s=1 the start-frame point is the full forward TZYX transform
        # (LaserOdometry::transformToStart, LaserOdometry.cpp:135-142)
        x = jnp.array([0.05, -0.03, 0.08, 0.2, -0.1, 0.3])
        p = jax.random.normal(KEY, (5, 3))
        out = twist.warp_to_start(x, p, jnp.ones(5))
        manual = se3.apply(se3.euler6_to_mat(x), p)
        np.testing.assert_allclose(out, manual, atol=1e-6)

    def test_warp_to_end_consistency(self):
        # warp_to_end at s=1 is identity (a point captured at sweep end stays)
        x = jnp.array([0.05, -0.03, 0.08, 0.2, -0.1, 0.3])
        p = jax.random.normal(KEY, (5, 3))
        out = twist.warp_to_end(x, p, jnp.ones(5))
        np.testing.assert_allclose(out, p, atol=1e-5)

    def test_point_to_map_matches_mat(self):
        x = jnp.array([0.05, -0.03, 0.08, 0.2, -0.1, 0.3])
        p = jax.random.normal(KEY, (5, 3))
        T = twist.to_mat(x)
        np.testing.assert_allclose(
            twist.point_to_map(x, p), se3.apply(T, p), atol=1e-6
        )

    def test_map_roundtrip(self):
        x = jnp.array([0.05, -0.03, 0.08, 0.2, -0.1, 0.3])
        p = jax.random.normal(KEY, (5, 3))
        np.testing.assert_allclose(
            twist.map_to_point(x, twist.point_to_map(x, p)), p, atol=1e-5
        )


class TestFrameTree:
    """utils/frames: the messege_to_tf pose decomposition
    (driver/src/messege_to_tf.cpp:100-175)."""

    def _pose(self, yaw=0.7, roll=0.1, pitch=-0.15, pos=(2.0, 1.5, -3.0)):
        from cooper_mapper_tpu.utils import frames

        cy, sy = np.cos(yaw), np.sin(yaw)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        cr, sr = np.cos(roll), np.sin(roll)
        Rr = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        cp, sp = np.cos(pitch), np.sin(pitch)
        Rp = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = (Ry @ Rr @ Rp).astype(np.float32)
        T[:3, 3] = pos
        return T, frames

    def test_decomposition(self):
        T, frames = self._pose()
        tree = frames.frame_tree(T)
        # base_link is the full pose
        np.testing.assert_array_equal(tree["base_link"], T)
        # stabilized: same position, yaw only (up stays up)
        st = tree["base_stabilized"]
        np.testing.assert_allclose(st[:3, 3], T[:3, 3])
        np.testing.assert_allclose(st[:3, :3] @ [0, 1, 0], [0, 1, 0],
                                   atol=1e-6)
        assert abs(frames.yaw_of(st) - frames.yaw_of(T)) < 1e-5
        # footprint: ground-projected
        fp = tree["base_footprint"]
        assert fp[1, 3] == 0.0
        np.testing.assert_allclose(fp[[0, 2], 3], T[[0, 2], 3])
        # laser frame composes the static extrinsic (tf_2D_broadcaster)
        T_bl = np.eye(4, dtype=np.float32)
        T_bl[2, 3] = 0.3
        tree2 = frames.frame_tree(T, T_bl)
        np.testing.assert_allclose(tree2["laser"], T @ T_bl, atol=1e-6)

    def test_roll_pitch_roundtrip(self):
        T, frames = self._pose(yaw=1.2, roll=0.08, pitch=-0.12)
        roll, pitch = frames.roll_pitch_of(T)
        # removing yaw then the recovered roll/pitch restores identity up
        # to numeric tolerance
        assert abs(roll - 0.08) < 0.02 and abs(pitch + 0.12) < 0.02

    def test_yaw_invariant_to_roll_pitch(self):
        Ta, frames = self._pose(yaw=0.9, roll=0.0, pitch=0.0)
        Tb, _ = self._pose(yaw=0.9, roll=0.1, pitch=-0.1)
        assert abs(frames.yaw_of(Ta) - 0.9) < 1e-5
        assert abs(frames.yaw_of(Tb) - 0.9) < 0.02
