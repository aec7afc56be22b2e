"""LOAM twist parameterization and in-sweep motion warps.

The reference keeps the solver state as a ``Twist`` — three Euler angles
(rx, ry, rz) plus a translation (Twist.h:13-36).  The *working* warps of
``LaserOdometry`` (the member functions, LaserOdometry.cpp:135-190 — NOT the
unused transform_utils variants) are forward TZYX transforms of the
time-scaled twist:

* ``warp_to_start`` (LaserOdometry.cpp:135-142):
      ``p_start = TZYX(s * x) p  =  Rz(s rz) Ry(s ry) Rx(s rx) p + s t``
  where ``s`` is the in-sweep time fraction (``10 * frac(intensity)``).
* ``warp_to_end`` (transformToEnd, :156-168): warp to start, then apply
  ``TZYX(x)^-1``.
* ``point_to_map`` — the scan-to-map warp (pointAssociateToMap,
  transform_utils.h:476-482): the same forward TZYX transform at s=1.

Under this convention the twist IS the relative sweep motion:
``T_start<-end = TZYX(x)``, so pose accumulation ``_Tsum @ TZYX(x)``
(transformUpdate, :649-653) is exact, and the closed-form solver Jacobian
(:557-575) is the true derivative at s=1.

All functions take a 6-vector state ``x = [rx, ry, rz, tx, ty, tz]`` and
broadcast over leading batch dimensions of both state and points.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3


def _tzyx_apply_elementwise(rx, ry, rz, tx, ty, tz, points):
    """Apply Rz(rz) Ry(ry) Rx(rx) p + t with per-point angles, elementwise.

    rx/ry/rz/tx/ty/tz broadcast against points[..., 0]; avoids materializing
    per-point 3x3 matrices (batched tiny matmuls lower poorly on the MXU).
    """
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    # R = Rz Ry Rx (see se3.euler_zyx_to_rot)
    ox = cz * cy * px + (cz * sy * sx - sz * cx) * py + (cz * sy * cx + sz * sx) * pz + tx
    oy = sz * cy * px + (sz * sy * sx + cz * cx) * py + (sz * sy * cx - cz * sx) * pz + ty
    oz = -sy * px + cy * sx * py + cy * cx * pz + tz
    return jnp.stack([ox, oy, oz], axis=-1)


def warp_to_start(x, points, s):
    """Project points captured at time fractions ``s`` to the sweep start.

    x: [..., 6]; points: [..., N, 3]; s: [..., N] in-sweep fraction in [0, 1].
    Matches LaserOdometry::transformToStart (LaserOdometry.cpp:135-142):
    ``p_start = TZYX(s*x) p`` with the twist linearly time-scaled.
    """
    return _tzyx_apply_elementwise(
        s * x[..., None, 0], s * x[..., None, 1], s * x[..., None, 2],
        s * x[..., None, 3], s * x[..., None, 4], s * x[..., None, 5],
        points,
    )


def warp_to_end(x, points, s):
    """Project points to the sweep end frame (transformToEnd,
    LaserOdometry.cpp:156-168): ``p_end = TZYX(x)^-1 warp_to_start(p)``."""
    p_start = warp_to_start(x, points, s)
    T_inv = se3.inverse(se3.euler6_to_mat(x))
    return p_start @ jnp.swapaxes(T_inv[..., :3, :3], -1, -2) + T_inv[..., None, :3, 3]


def point_to_map(x, points):
    """World registration of points: ``Rz(rz) Ry(ry) Rx(rx) p + t``.

    Matches pointAssociateToMap (transform_utils.h:476-482).
    x: [..., 6]; points: [..., N, 3].
    """
    return _tzyx_apply_elementwise(
        x[..., None, 0], x[..., None, 1], x[..., None, 2],
        x[..., None, 3], x[..., None, 4], x[..., None, 5],
        points,
    )


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
    """Twist -> the relative sensor pose over the sweep, M = T_start^-1 T_end.

    With the forward TZYX warp convention this is simply TZYX(x): a world
    point with end-frame coordinates p has start-frame coordinates
    TZYX(x) p, so the end pose in the start frame IS TZYX(x).
    """
    return se3.euler6_to_mat(x)


def from_relative_motion(M):
    """Inverse of to_relative_motion: relative pose -> twist 6-vec."""
    return se3.mat_to_euler6(M)
