"""SE(3) / Euler-convention math for the LOAM-style solvers.

The reference C++ stack (see /root/reference/L_SLAM/src/util/transform_utils.h and
math_utils.h) mixes several Euler conventions.  The ones that matter for numerical
parity are:

* ``TZYX`` — the *canonical* pose convention used for accumulated poses and for the
  scan-to-map warp (``convertTransform`` / ``pointAssociateToMap``,
  transform_utils.h:308-331, 476-482):  ``p' = Rz(rz) @ Ry(ry) @ Rx(rx) @ p + t``.
* the *odometry warp* used by ``transformToStart`` (transform_utils.h:358-372):
  ``p_start = Ry(-s*ry) @ Rx(-s*rx) @ Rz(-s*rz) @ (p - s*t)`` where ``s`` is the
  in-sweep interpolation factor.
* ``rotateZXY`` / ``rotateYXZ`` (math_utils.h:184-236) — sequential single-axis
  rotations applied in the named order (first named axis applied first).

Everything here is pure JAX on arrays, batched-friendly (leading batch dims are
fine for every function; matrices are ``(..., 3, 3)`` / ``(..., 4, 4)``).

Euler state vectors are packed ``[rx, ry, rz, tx, ty, tz]`` — the same ordering as
the reference solver state (LaserOdometry.cpp:615-620).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# Elementary rotations.  Conventions match math_utils.h rotX/rotY/rotZ
# (right-handed, standard).
# ----------------------------------------------------------------------------


def rot_x(a):
    """(...,) angle -> (..., 3, 3) rotation about x."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


# ----------------------------------------------------------------------------
# Composed Euler rotations.
# ----------------------------------------------------------------------------


def euler_zyx_to_rot(rx, ry, rz):
    """R = Rz(rz) @ Ry(ry) @ Rx(rx) — the TZYX convention.

    Matches getTransformationTZYX (transform_utils.h:288-299).
    """
    return rot_z(rz) @ rot_y(ry) @ rot_x(rx)


def rot_to_euler_zyx(R):
    """Inverse of euler_zyx_to_rot; matches getEulerAngles (transform_utils.h:54-60).

    Returns (rx, ry, rz).
    """
    rx = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    ry = jnp.arcsin(-jnp.clip(R[..., 2, 0], -1.0, 1.0))
    rz = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return rx, ry, rz


def rotate_zxy(p, az, ax, ay):
    """Apply rotZ(az), then rotX(ax), then rotY(ay) to points p (..., 3).

    Matches rotateZXY (math_utils.h:184-205):  p' = Ry(ay) @ Rx(ax) @ Rz(az) @ p.
    """
    R = rot_y(ay) @ rot_x(ax) @ rot_z(az)
    return (R @ p[..., None])[..., 0]


def rotate_yxz(p, ay, ax, az):
    """Apply rotY(ay), then rotX(ax), then rotZ(az):  p' = Rz @ Rx @ Ry @ p.

    Matches rotateYXZ (math_utils.h:215-236).
    """
    R = rot_z(az) @ rot_x(ax) @ rot_y(ay)
    return (R @ p[..., None])[..., 0]


# ----------------------------------------------------------------------------
# Euler-6 pose vectors <-> 4x4 matrices (TZYX convention).
# ----------------------------------------------------------------------------


def euler6_to_mat(x):
    """[..., 6] (rx,ry,rz,tx,ty,tz) -> [..., 4, 4] with R = Rz Ry Rx, t = txyz.

    The canonical pose representation (convertTransform, transform_utils.h:308-311).
    """
    R = euler_zyx_to_rot(x[..., 0], x[..., 1], x[..., 2])
    return make_mat(R, x[..., 3:6])


def mat_to_euler6(T):
    """[..., 4, 4] -> [..., 6] (rx,ry,rz,tx,ty,tz), TZYX convention."""
    rx, ry, rz = rot_to_euler_zyx(T[..., :3, :3])
    return jnp.concatenate(
        [jnp.stack([rx, ry, rz], -1), T[..., :3, 3]], axis=-1
    )


def make_mat(R, t):
    """(...,3,3), (...,3) -> (...,4,4) homogeneous transform."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def identity_mat(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def compose(A, B):
    """A @ B for (...,4,4) transforms."""
    return A @ B


def inverse(T):
    """Closed-form inverse of a rigid transform (...,4,4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_mat(Rt, -(Rt @ t[..., None])[..., 0])


def apply(T, p):
    """Apply (...,4,4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if p.ndim >= 2 and p.shape[-2:] != (3,):
        # points batch (..., N, 3): R (...,3,3) @ p^T
        return p @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return (R @ p[..., None])[..., 0] + t


def transform_associate(L_old, L_new, W_old):
    """W_new = (W_old @ L_old^-1) @ L_new  (transform_utils.h:502-507).

    Chains the mapping correction onto fresh odometry.
    """
    return W_old @ inverse(L_old) @ L_new


# ----------------------------------------------------------------------------
# Quaternions (w, x, y, z) — used by the UKF / fusion layer.
# ----------------------------------------------------------------------------


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        -1,
    )


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rot(q):
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def rot_to_quat(R):
    """Robust rotation-matrix -> quaternion (w,x,y,z), branchless for jit."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions, pick the numerically best
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

    cands = jnp.stack([q0, q1, q2, q3], -2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], -1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q * jnp.sign(q[..., :1] + 1e-30)  # w >= 0 canonical
    return quat_normalize(q)


def quat_from_axis_angle(axis, angle):
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_slerp(q0, q1, u):
    """Spherical interpolation; u in [0,1]."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    # fall back to lerp when nearly parallel
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - u, jnp.sin((1.0 - u) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, u, jnp.sin(u * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ----------------------------------------------------------------------------
# se(3) exp/log — used by the pose-graph solver (native mode).
# ----------------------------------------------------------------------------


def skew(v):
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def so3_exp(w):
    """(...,3) -> (...,3,3) via Rodrigues, Taylor-safe near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-30)
    W = skew(w)
    small = theta < 1e-2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R):
    """(...,3,3) -> (...,3), Taylor-safe AND autodiff-safe.

    arccos has an infinite derivative at cos(theta) -> 1, which poisons
    forward-mode Jacobians through the small-angle branch of a naive
    where(); the small branch here is computed purely from the vee vector
    (|vee| = sin(theta)), so its tangent never touches arccos.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    w_skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    vee = jnp.stack([w_skew[..., 2, 1], w_skew[..., 0, 2], w_skew[..., 1, 0]], -1)

    small = cos_theta > 0.9999  # theta < ~1.4e-2
    safe_cos = jnp.where(small, 0.5, cos_theta)          # keep arccos' finite
    theta = jnp.arccos(safe_cos)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - safe_cos * safe_cos, 1e-12))
    scale_exact = theta / sin_theta
    s2 = jnp.sum(vee * vee, axis=-1)                     # = sin(theta)^2
    scale_small = 1.0 + s2 / 6.0                         # theta/sin ~ 1 + th^2/6
    scale = jnp.where(small, scale_small, scale_exact)
    return vee * scale[..., None]


def se3_exp(xi):
    """(...,6) [v, w] -> (...,4,4).  Twist order: translation first, rotation last 3."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-30)
    W = skew(w)
    small = theta < 1e-2
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-30))
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    return make_mat(R, (V @ v[..., None])[..., 0])


def se3_log(T):
    """(...,4,4) -> (...,6) [v, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-30)
    W = skew(w)
    small = theta < 1e-2
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / jnp.maximum(theta2, 1e-30),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = I - 0.5 * W + coef[..., None, None] * (W @ W)
    return jnp.concatenate([(Vinv @ t[..., None])[..., 0], w], axis=-1)
