"""TransformMaintenance — IMU-rate pose output.

Re-design of ``TransformMaintenance``
(/root/reference/L_SLAM/src/odometry/TransformMaintenance.h:35-498): given the
latest map-corrected anchor pose (the /lidar_to_map2 message) and the IMU
samples newer than it, dead-reckon a high-rate pose stream:

    pos += v * dt;   q <- q * (T_li dq T_li^-1)      (imuStep, :453-467)

acceleration is deliberately ignored (too noisy, same stance as the
reference).  The whole IMU window is processed in one scan, producing the
full [M] pose trail instead of one callback at a time.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..fusion.imu_queue import ImuBatch
from ..utils import se3


@partial(jax.jit, static_argnames=())
def imu_rate_poses(
    anchor_pose,    # [4,4] latest corrected pose (lidar frame)
    anchor_stamp,   # [] time of the anchor
    velocity,       # [3] world-frame velocity estimate
    batch: ImuBatch,
    T_li,           # [4,4] lidar -> imu extrinsic
):
    """Dead-reckon poses at each IMU sample newer than the anchor.

    Returns (poses [M,4,4], valid [M]).
    """
    q0 = se3.rot_to_quat(anchor_pose[:3, :3])
    p0 = anchor_pose[:3, 3]
    q_li = se3.rot_to_quat(T_li[:3, :3])
    q_il = se3.rot_to_quat(se3.inverse(T_li)[:3, :3])

    use = batch.mask & (batch.stamp > anchor_stamp)

    def step(carry, inp):
        p, q, t_prev = carry
        stamp, gyro, ok = inp
        dt = jnp.clip(stamp - t_prev, 0.0, 0.5)
        p_new = p + velocity * dt
        half = 0.5 * dt * gyro
        dq = se3.quat_normalize(
            jnp.concatenate([jnp.ones(1), half])
        )
        # q <- q * (q_li dq q_li^-1): gyro measured in the IMU frame
        dq_l = se3.quat_multiply(se3.quat_multiply(q_li, dq), q_il)
        q_new = se3.quat_normalize(se3.quat_multiply(q, dq_l))
        p = jnp.where(ok, p_new, p)
        q = jnp.where(ok, q_new, q)
        t = jnp.where(ok, stamp, t_prev)
        return (p, q, t), (p, q)

    (_, _, _), (ps, qs) = jax.lax.scan(
        step, (p0, q0, anchor_stamp), (batch.stamp, batch.gyro, use)
    )
    poses = se3.make_mat(se3.quat_to_rot(qs), ps)
    return poses, use
