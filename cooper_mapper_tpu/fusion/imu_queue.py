"""IMU sample replay into the UKF pose estimator.

Re-design of ``IMUQueue`` (/root/reference/L_SLAM/src/kf_fusion/imu_queue.h:30-163):
the host feeds fixed-capacity arrays of IMU samples per sweep interval; replay
is a lax.scan of unscented predicts over the masked samples, and
predict/correct hop between the IMU and lidar frames through the extrinsic
``T_li`` exactly as the reference (:68-139).

The reference's mutex-guarded deque becomes pure data: the pipeline passes
``ImuBatch`` arrays (stamp-sorted, masked) alongside each sweep.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import UKFConfig
from ..utils import se3
from . import ukf_estimator


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImuBatch:
    """Fixed-capacity IMU sample window (sorted by stamp, masked)."""

    stamp: jax.Array  # [M] seconds
    acc: jax.Array    # [M, 3]
    gyro: jax.Array   # [M, 3]
    mask: jax.Array   # [M]


def replay_predict(
    state: ukf_estimator.PoseEstimatorState,
    batch: ImuBatch,
    t_from,
    t_until,
    cfg: UKFConfig,
) -> ukf_estimator.PoseEstimatorState:
    """Run UKF predicts through all samples with t_from < stamp <= t_until.

    dt for each step is the gap to the previous applied sample (clamped to
    [0, 0.5] s like the reference's sanity window).  Samples inside the
    predict cool-down window after filter creation are skipped — the
    reference's ``(stamp - init_stamp) < cool_time_duration`` early return
    (ukf_pose_estimator.hpp:67-71).
    """
    in_window = batch.mask & (batch.stamp > t_from) & (batch.stamp <= t_until)
    warm = batch.stamp - state.init_stamp >= cfg.cool_time_duration
    use = in_window & warm

    def step(carry, inp):
        est, t_prev = carry
        stamp, acc, gyro, ok, seen = inp
        dt = jnp.clip(stamp - t_prev, 0.0, 0.5)

        pred = ukf_estimator.predict(est, acc, gyro, dt, cfg)
        est_new = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), pred, est
        )
        # prev_stamp advances on cool-down-skipped samples too (the
        # reference's early return still sets prev_stamp = stamp)
        t_new = jnp.where(seen, stamp, t_prev)
        return (est_new, t_new), None

    (final, _), _ = jax.lax.scan(
        step, (state, t_from), (batch.stamp, batch.acc, batch.gyro, use, in_window)
    )
    return final


def lidar_pose(state: ukf_estimator.PoseEstimatorState, T_li):
    """UKF (IMU-frame) pose -> lidar-frame pose: T_lidar = T_imu @ T_li^-1.

    T_li maps lidar -> imu (loadExtrinsic.hpp semantics, imu_queue.h:102-112).
    """
    return ukf_estimator.pose_matrix(state) @ se3.inverse(T_li)


def correct_from_lidar(
    state: ukf_estimator.PoseEstimatorState,
    T_lidar,
    vel,
    T_li,
    cfg: UKFConfig,
) -> ukf_estimator.PoseEstimatorState:
    """Transform a lidar-frame pose to the IMU frame and correct (:124-139)."""
    T_imu = T_lidar @ T_li
    q = se3.rot_to_quat(T_imu[..., :3, :3])
    return ukf_estimator.correct(state, T_imu[..., :3, 3], vel, q, cfg)


def empty_batch(capacity: int) -> ImuBatch:
    return ImuBatch(
        stamp=jnp.zeros(capacity, jnp.float32),
        acc=jnp.zeros((capacity, 3), jnp.float32),
        gyro=jnp.zeros((capacity, 3), jnp.float32),
        mask=jnp.zeros(capacity, bool),
    )
