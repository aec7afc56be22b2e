"""Pose-estimator facade over the generic UKF.

Re-design of ``kf::UKFPoseEstimator``
(/root/reference/L_SLAM/src/kf_fusion/kf/ukf_pose_estimator.hpp:16-130):
fixed process/measurement noise profile (:35-60), predict with dt scaling,
10-dim [p, v, q] correct, and velocity clamping / reset used by
LaserLocalization::transformUpdate (LaserLocalization.cpp:140-166).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import UKFConfig
from ..ops import ukf
from ..utils import se3
from . import pose_system


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseEstimatorState:
    ukf: ukf.UKFState
    last_correct_pos: jax.Array  # [..., 3] for the >5 m reset jump check
    init_stamp: jax.Array        # [...] filter birth time for the predict
                                 # cool-down window (ukf_pose_estimator.hpp:67-71)


def process_noise(cfg: UKFConfig):
    d = jnp.concatenate(
        [
            jnp.full(3, cfg.process_noise_pos),
            jnp.full(3, cfg.process_noise_vel),
            jnp.full(4, cfg.process_noise_quat),
            jnp.full(6, cfg.process_noise_bias),
        ]
    )
    return jnp.diag(d.astype(jnp.float32))


def measurement_noise(cfg: UKFConfig):
    d = jnp.concatenate(
        [
            jnp.full(3, cfg.measure_noise_pos),
            jnp.full(3, cfg.measure_noise_vel),
            jnp.full(4, cfg.measure_noise_quat),
        ]
    )
    return jnp.diag(d.astype(jnp.float32))


def create(cfg: UKFConfig, pos=None, quat=None, init_stamp=0.0) -> PoseEstimatorState:
    mean = jnp.zeros(16, jnp.float32).at[6].set(1.0)  # identity quaternion
    if pos is not None:
        mean = mean.at[0:3].set(pos)
    if quat is not None:
        mean = mean.at[6:10].set(quat)
    cov = 0.01 * jnp.eye(16, dtype=jnp.float32)
    return PoseEstimatorState(
        ukf.UKFState(mean, cov), mean[0:3], jnp.float32(init_stamp)
    )


def predict(state: PoseEstimatorState, acc, gyro, dt, cfg: UKFConfig,
            stamp=None) -> PoseEstimatorState:
    """IMU-driven unscented predict.

    Process noise is scaled by dt (continuous-time white noise) — the
    reference adds a fixed Q per call (unscented_kalman_filter.hpp:93), which
    makes the drift rate depend on the IMU rate and lets the quaternion
    covariance blow past the double-cover under long prediction windows.

    With ``stamp`` given, the predict is skipped inside the cool-down window
    after filter creation (``stamp - init_stamp < cfg.cool_time_duration``,
    ukf_pose_estimator.hpp:67-71): the filter state passes through unchanged.
    """
    control = jnp.concatenate([acc, gyro], axis=-1)
    new = ukf.predict(
        state.ukf, pose_system.make_f(dt), control, dt * process_noise(cfg), cfg.lam
    )
    out = PoseEstimatorState(new, state.last_correct_pos, state.init_stamp)
    if stamp is None:
        return out
    warm = (jnp.asarray(stamp, jnp.float32) - state.init_stamp
            ) >= cfg.cool_time_duration
    return jax.tree.map(lambda a, b: jnp.where(warm, a, b), out, state)


def correct(state: PoseEstimatorState, pos, vel, quat, cfg: UKFConfig) -> PoseEstimatorState:
    """Pose/velocity correction from the matcher.

    A velocity above cfg.max_velocity is zeroed — the reference discards the
    whole velocity estimate, not just its excess (``if(_velocity.norm()>30)
    _velocity = Eigen::Vector3f::Zero()``, LaserLocalization.cpp:158-160) —
    and the filter resets when the correction jumps more than cfg.reset_jump
    meters (TransformMaintenance.h:393-402).
    """
    speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
    vel = jnp.where(speed > cfg.max_velocity, jnp.zeros_like(vel), vel)
    z = jnp.concatenate([pos, vel, se3.quat_normalize(quat)], axis=-1)
    corrected = ukf.correct(
        state.ukf, pose_system.h, z, measurement_noise(cfg), cfg.lam
    )

    jump = jnp.linalg.norm(pos - state.last_correct_pos, axis=-1)
    reset_mean = jnp.zeros_like(corrected.mean)
    reset_mean = reset_mean.at[..., 0:3].set(pos)
    reset_mean = reset_mean.at[..., 3:6].set(vel)
    reset_mean = reset_mean.at[..., 6:10].set(se3.quat_normalize(quat))
    reset_cov = 0.01 * jnp.eye(16, dtype=corrected.mean.dtype)

    do_reset = jump > cfg.reset_jump
    mean = jnp.where(do_reset[..., None], reset_mean, corrected.mean)
    cov = jnp.where(do_reset[..., None, None], reset_cov, corrected.cov)
    return PoseEstimatorState(ukf.UKFState(mean, cov), pos, state.init_stamp)


def pose_matrix(state: PoseEstimatorState):
    """Current [4,4] pose estimate."""
    mean = state.ukf.mean
    R = se3.quat_to_rot(mean[..., 6:10])
    return se3.make_mat(R, mean[..., 0:3])


def velocity(state: PoseEstimatorState):
    return state.ukf.mean[..., 3:6]
