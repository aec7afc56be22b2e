"""LOAM twist parameterization and in-sweep motion warps.

The reference keeps the solver state as a ``Twist`` — three Euler angles
(rx, ry, rz) plus a translation (Twist.h:13-36) — and uses two distinct warps:

* ``warp_to_start`` — motion-compensated projection of a point captured at
  in-sweep time fraction ``s`` back to the sweep *start* frame
  (transform_utils.h:358-372):
      ``p_start = Ry(-s*ry) Rx(-s*rx) Rz(-s*rz) (p - s*t)``
* ``warp_to_end`` — projection to the sweep *end* frame
  (transform_utils.h:403-423): warp to start, then
      ``p_end = Rz(rz) Rx(rx) Ry(ry) p_start + t``
* ``point_to_map`` — the scan-to-map warp (pointAssociateToMap,
  transform_utils.h:476-482, via convertTransform TZYX):
      ``p_world = Rz(rz) Ry(ry) Rx(rx) p + t``

All functions take a 6-vector state ``x = [rx, ry, rz, tx, ty, tz]`` and
broadcast over leading batch dimensions of both state and points.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3


def warp_to_start(x, points, s):
    """Project points captured at time fractions ``s`` to the sweep start.

    x: [..., 6]; points: [..., N, 3]; s: [..., N] in-sweep fraction in [0, 1].
    Matches transformToStart (transform_utils.h:358-372), where
    ``s = 10 * frac(intensity)`` in the reference encoding.
    """
    s = s[..., None]
    shifted = points - s * x[..., None, 3:6]
    # rotateZXY(p, -s*rz, -s*rx, -s*ry): Ry(-s*ry) @ Rx(-s*rx) @ Rz(-s*rz) @ p
    sa = s[..., 0]
    R = (
        se3.rot_y(-sa * x[..., None, 1])
        @ se3.rot_x(-sa * x[..., None, 0])
        @ se3.rot_z(-sa * x[..., None, 2])
    )
    return (R @ shifted[..., None])[..., 0]


def warp_to_end(x, points, s):
    """Project points to the sweep end frame (transformToEnd).

    Warp to start, then apply the full sweep motion:
    ``p_end = Rz(rz) Rx(rx) Ry(ry) p_start + t``  (rotateYXZ then add t).
    """
    p_start = warp_to_start(x, points, s)
    R = se3.rot_z(x[..., None, 2]) @ se3.rot_x(x[..., None, 0]) @ se3.rot_y(x[..., None, 1])
    return (R @ p_start[..., None])[..., 0] + x[..., None, 3:6]


def point_to_map(x, points):
    """World registration of points: ``Rz(rz) Ry(ry) Rx(rx) p + t``.

    Matches pointAssociateToMap (transform_utils.h:476-482).
    x: [..., 6]; points: [..., N, 3].
    """
    R = se3.euler_zyx_to_rot(x[..., 0], x[..., 1], x[..., 2])
    return points @ jnp.swapaxes(R, -1, -2) + x[..., None, 3:6]


def map_to_point(x, points):
    """Inverse of point_to_map (pointAssociateTobeMapped)."""
    R = se3.euler_zyx_to_rot(x[..., 0], x[..., 1], x[..., 2])
    return (points - x[..., None, 3:6]) @ R


def to_mat(x):
    """Twist 6-vec -> 4x4 matrix in the canonical TZYX convention."""
    return se3.euler6_to_mat(x)


def from_mat(T):
    return se3.mat_to_euler6(T)


def compose_accumulate(T_sum, x):
    """_Tsum = _Tsum @ TZYX(x)  (LaserOdometry::transformUpdate, :649-653)."""
    return T_sum @ to_mat(x)


def to_relative_motion(x):
    """Twist -> the exact relative sensor pose over the sweep, M = T_start^-1 T_end.

    From the warp definition p_start = R(-1) (p_end - t) with
    R(-1) = Ry(-ry) Rx(-rx) Rz(-rz):  M = [R(-1) | -R(-1) t].
    """
    R = (
        se3.rot_y(-x[..., 1]) @ se3.rot_x(-x[..., 0]) @ se3.rot_z(-x[..., 2])
    )
    t = -(R @ x[..., 3:6, None])[..., 0]
    return se3.make_mat(R, t)


def from_relative_motion(M):
    """Inverse of to_relative_motion: relative pose -> twist 6-vec.

    Decomposes M[:3,:3]^T = Rz(rz) Rx(rx) Ry(ry) (ZXY intrinsic order).
    """
    Rt = jnp.swapaxes(M[..., :3, :3], -1, -2)
    rx = jnp.arcsin(jnp.clip(Rt[..., 2, 1], -1.0, 1.0))
    ry = jnp.arctan2(-Rt[..., 2, 0], Rt[..., 2, 2])
    rz = jnp.arctan2(-Rt[..., 0, 1], Rt[..., 1, 1])
    t = -(Rt @ M[..., :3, 3, None])[..., 0]
    return jnp.concatenate([jnp.stack([rx, ry, rz], -1), t], axis=-1)
