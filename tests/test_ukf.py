import jax
import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.config import UKFConfig
from cooper_mapper_tpu.fusion import imu_queue, pose_system, ukf_estimator
from cooper_mapper_tpu.ops import ukf
from cooper_mapper_tpu.utils import se3


CFG = UKFConfig()


class TestSigmaPoints:
    def test_moments_roundtrip(self):
        # unscented transform of identity f reproduces mean/cov
        key = jax.random.PRNGKey(0)
        mean = jax.random.normal(key, (5,))
        A = jax.random.normal(jax.random.PRNGKey(1), (5, 5)) * 0.3
        cov = A @ A.T + 0.5 * jnp.eye(5)
        pts, w = ukf.sigma_points(mean, cov, lam=1.0)
        m2, c2 = ukf.unscented_moments(pts, w)
        np.testing.assert_allclose(m2, mean, atol=1e-4)
        np.testing.assert_allclose(c2, cov, atol=1e-3)

    def test_linear_predict_matches_kalman(self):
        # for linear f the UKF equals the linear KF exactly
        F = jnp.array([[1.0, 0.1], [0.0, 1.0]])
        Q = 0.01 * jnp.eye(2)
        mean = jnp.array([1.0, -2.0])
        cov = jnp.array([[0.5, 0.1], [0.1, 0.3]])
        st = ukf.UKFState(mean, cov)
        f = lambda pts, u: pts @ F.T
        out = ukf.predict(st, f, jnp.zeros(0), Q)
        np.testing.assert_allclose(out.mean, F @ mean, atol=1e-5)
        np.testing.assert_allclose(out.cov, F @ cov @ F.T + Q, atol=1e-4)

    def test_linear_correct_matches_kalman(self):
        H = jnp.array([[1.0, 0.0]])
        R = jnp.array([[0.1]])
        mean = jnp.array([1.0, -2.0])
        cov = jnp.array([[0.5, 0.1], [0.1, 0.3]])
        z = jnp.array([1.4])
        st = ukf.UKFState(mean, cov)
        out = ukf.correct(st, lambda pts: pts @ H.T, z, R)
        # closed-form KF
        S = H @ cov @ H.T + R
        K = cov @ H.T @ jnp.linalg.inv(S)
        mean_kf = mean + K @ (z - H @ mean)
        cov_kf = cov - K @ S @ K.T
        np.testing.assert_allclose(out.mean, mean_kf, atol=1e-4)
        np.testing.assert_allclose(out.cov, cov_kf, atol=1e-3)


class TestPoseEstimator:
    def test_constant_velocity_prediction(self):
        st = ukf_estimator.create(CFG)
        st.ukf.mean = st.ukf.mean.at[3:6].set(jnp.array([1.0, 0.0, 0.0]))
        for _ in range(10):
            st = ukf_estimator.predict(st, jnp.zeros(3), jnp.zeros(3), 0.1, CFG)
        np.testing.assert_allclose(st.ukf.mean[0:3], [1.0, 0, 0], atol=0.02)

    def test_gyro_rotation(self):
        st = ukf_estimator.create(CFG)
        # rotate about z at 1 rad/s for 0.5 s
        for _ in range(50):
            st = ukf_estimator.predict(
                st, jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), 0.01, CFG
            )
        R = se3.quat_to_rot(st.ukf.mean[6:10])
        expected = se3.rot_z(jnp.array(0.5))
        np.testing.assert_allclose(R, expected, atol=0.01)

    def test_correct_pulls_to_measurement(self):
        st = ukf_estimator.create(CFG)
        # predict/correct cycles as in the real pipeline — process noise keeps
        # the gain alive so the estimate tracks the measurement
        for _ in range(15):
            st = ukf_estimator.predict(st, jnp.zeros(3), jnp.zeros(3), 0.1, CFG)
            st = ukf_estimator.correct(
                st, jnp.array([1.0, 2.0, 3.0]), jnp.zeros(3),
                jnp.array([1.0, 0, 0, 0]), CFG,
            )
        np.testing.assert_allclose(st.ukf.mean[0:3], [1, 2, 3], atol=0.05)

    def test_reset_on_jump(self):
        st = ukf_estimator.create(CFG)
        st = ukf_estimator.correct(
            st, jnp.zeros(3), jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), CFG
        )
        st = ukf_estimator.correct(
            st, jnp.array([100.0, 0, 0]), jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), CFG
        )
        # after a >5 m jump the filter resets straight to the measurement
        np.testing.assert_allclose(st.ukf.mean[0:3], [100, 0, 0], atol=1e-4)

    def test_velocity_discard(self):
        # the reference ZEROES a >30 m/s velocity estimate rather than
        # clamping it (LaserLocalization.cpp:158-160)
        st = ukf_estimator.create(CFG)
        st = ukf_estimator.correct(
            st, jnp.zeros(3), jnp.array([1000.0, 0, 0]), jnp.array([1.0, 0, 0, 0]), CFG
        )
        assert float(jnp.linalg.norm(st.ukf.mean[3:6])) < 1.0


class TestImuReplay:
    def test_masked_replay(self):
        st = ukf_estimator.create(CFG, init_stamp=-10.0)  # warm (past cool-down)
        st.ukf.mean = st.ukf.mean.at[3:6].set(jnp.array([2.0, 0.0, 0.0]))
        stamps = jnp.arange(1, 11, dtype=jnp.float32) * 0.01
        batch = imu_queue.ImuBatch(
            stamp=stamps,
            acc=jnp.zeros((10, 3)),
            gyro=jnp.zeros((10, 3)),
            mask=jnp.ones(10, bool),
        )
        out = imu_queue.replay_predict(st, batch, 0.0, 0.05, CFG)
        # only 5 samples applied -> 0.05 s at 2 m/s = 0.1 m
        np.testing.assert_allclose(out.ukf.mean[0], 0.1, atol=0.01)

    def test_predict_cool_down(self):
        # samples within cool_time_duration of init_stamp leave the filter
        # untouched (ukf_pose_estimator.hpp:67-71)
        st = ukf_estimator.create(CFG, init_stamp=0.0)
        st.ukf.mean = st.ukf.mean.at[3:6].set(jnp.array([2.0, 0.0, 0.0]))
        stamps = jnp.arange(1, 11, dtype=jnp.float32) * 0.01  # all < 1.0 s
        batch = imu_queue.ImuBatch(
            stamp=stamps, acc=jnp.zeros((10, 3)), gyro=jnp.zeros((10, 3)),
            mask=jnp.ones(10, bool),
        )
        cold = imu_queue.replay_predict(st, batch, 0.0, 0.1, CFG)
        np.testing.assert_allclose(cold.ukf.mean, st.ukf.mean, atol=1e-7)
        np.testing.assert_allclose(cold.ukf.cov, st.ukf.cov, atol=1e-7)
        # the same window past the cool-down does move the state
        late = imu_queue.ImuBatch(
            stamp=stamps + 2.0, acc=batch.acc, gyro=batch.gyro, mask=batch.mask
        )
        warm = imu_queue.replay_predict(st, late, 2.0, 2.1, CFG)
        assert float(warm.ukf.mean[0]) > 0.05  # 2 m/s * ~0.09 s applied

    def test_cool_down_advances_prev_stamp(self):
        # a sample skipped by the cool-down must still advance prev_stamp so
        # the first warm predict does not integrate the whole cold window
        st = ukf_estimator.create(CFG, init_stamp=0.0)
        st.ukf.mean = st.ukf.mean.at[3:6].set(jnp.array([1.0, 0.0, 0.0]))
        stamps = jnp.array([0.5, 1.2], jnp.float32)  # first cold, second warm
        batch = imu_queue.ImuBatch(
            stamp=stamps, acc=jnp.zeros((2, 3)), gyro=jnp.zeros((2, 3)),
            mask=jnp.ones(2, bool),
        )
        out = imu_queue.replay_predict(st, batch, 0.0, 1.5, CFG)
        # dt of the warm step is 1.2-0.5=0.7 (clamped at 0.5), NOT 1.2
        assert float(out.ukf.mean[0]) <= 0.5 + 1e-4

    def test_extrinsic_roundtrip(self):
        st = ukf_estimator.create(CFG, pos=jnp.array([1.0, 2.0, 3.0]))
        T_li = se3.make_mat(se3.rot_z(jnp.array(0.3)), jnp.array([0.1, 0.0, -0.2]))
        T_lidar = imu_queue.lidar_pose(st, T_li)
        st2 = imu_queue.correct_from_lidar(st, T_lidar, jnp.zeros(3), T_li, CFG)
        # correcting with the exact same pose should not move the estimate much
        np.testing.assert_allclose(st2.ukf.mean[0:3], st.ukf.mean[0:3], atol=0.01)
