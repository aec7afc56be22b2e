"""Synthetic LiDAR world and sweep simulator.

The reference is validated by replaying recorded rosbags (SURVEY.md §4); no
bags ship with this environment, so the simulator takes their place as the
test/bench workload generator: a ray-cast planar world (rooms/corridors whose
wall intersections produce corner features and whose faces produce surface
features) swept by a moving multi-ring scanner, with optional in-sweep motion
distortion — giving ground-truth trajectories for ATE evaluation
(the role of the reference's GPS-vs-SLAM Evaluation node,
map_evaluation/Evaluation.cpp).

Frame convention: y is up; the scanner spins about +y; ring elevation angles
tilt toward +y.  This matches the reference's LOAM working frame where the
axis remap (MultiScanRegistration.cpp:120-123) puts the spin axis on y.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.features import Sweep
from ..utils import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PlaneWorld:
    """Rectangles: origin [M,3], edge vectors u,v [M,3] (extent 0..1 each)."""

    origin: jax.Array
    u: jax.Array
    v: jax.Array

    @property
    def normals(self):
        n = jnp.cross(self.u, self.v)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def _rect(o, u, v):
    return np.asarray(o, np.float32), np.asarray(u, np.float32), np.asarray(v, np.float32)


def make_room_world(
    size=(30.0, 4.0, 40.0),
    n_pillars: int = 6,
    pillar_half: float = 0.4,
    seed: int = 0,
) -> PlaneWorld:
    """A rectangular room (floor, ceiling, 4 walls) with box pillars inside.

    Pillar vertical edges create corner features; faces create surf features.
    """
    sx, sy, sz = size
    rects = []
    # floor (y=0) and ceiling (y=sy)
    rects.append(_rect([-sx / 2, 0, -sz / 2], [sx, 0, 0], [0, 0, sz]))
    rects.append(_rect([-sx / 2, sy, -sz / 2], [sx, 0, 0], [0, 0, sz]))
    # walls
    rects.append(_rect([-sx / 2, 0, -sz / 2], [sx, 0, 0], [0, sy, 0]))   # z=-sz/2
    rects.append(_rect([-sx / 2, 0, sz / 2], [sx, 0, 0], [0, sy, 0]))    # z=+sz/2
    rects.append(_rect([-sx / 2, 0, -sz / 2], [0, 0, sz], [0, sy, 0]))   # x=-sx/2
    rects.append(_rect([sx / 2, 0, -sz / 2], [0, 0, sz], [0, sy, 0]))    # x=+sx/2

    rng = np.random.default_rng(seed)
    for _ in range(n_pillars):
        cx = rng.uniform(-sx / 2 + 3, sx / 2 - 3)
        cz = rng.uniform(-sz / 2 + 3, sz / 2 - 3)
        h = pillar_half
        # 4 vertical faces of a square pillar
        rects.append(_rect([cx - h, 0, cz - h], [2 * h, 0, 0], [0, sy, 0]))
        rects.append(_rect([cx - h, 0, cz + h], [2 * h, 0, 0], [0, sy, 0]))
        rects.append(_rect([cx - h, 0, cz - h], [0, 0, 2 * h], [0, sy, 0]))
        rects.append(_rect([cx + h, 0, cz - h], [0, 0, 2 * h], [0, sy, 0]))

    o, u, v = (np.stack(x) for x in zip(*rects))
    return PlaneWorld(jnp.asarray(o), jnp.asarray(u), jnp.asarray(v))


def ray_cast(world: PlaneWorld, origins, directions, max_range=150.0):
    """First-hit distances for rays.  origins/directions: [..., 3].

    Returns (t, hit): [...] distances (max_range where no hit) and hit mask.
    """
    n = world.normals                                   # [M,3]
    o = origins[..., None, :]                           # [..., 1, 3]
    d = directions[..., None, :]
    denom = jnp.sum(d * n, axis=-1)                     # [..., M]
    t = jnp.sum((world.origin - o) * n, axis=-1) / jnp.where(
        jnp.abs(denom) < 1e-8, jnp.inf, denom
    )
    p = o + t[..., None] * d                            # hit points [..., M, 3]
    rel = p - world.origin
    uu = jnp.sum(world.u * world.u, axis=-1)
    vv = jnp.sum(world.v * world.v, axis=-1)
    a = jnp.sum(rel * world.u, axis=-1) / uu
    b = jnp.sum(rel * world.v, axis=-1) / vv
    ok = (t > 0.05) & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
    t = jnp.where(ok, t, jnp.inf)
    tmin = jnp.min(t, axis=-1)
    hit = jnp.isfinite(tmin) & (tmin <= max_range)
    return jnp.where(hit, tmin, max_range), hit


@partial(jax.jit, static_argnames=("n_rings", "width", "distortion", "noise"))
def scan_sweep(
    world: PlaneWorld,
    pose_start,        # [4,4] sensor pose at sweep start (sensor->world)
    pose_end,          # [4,4] sensor pose at sweep end
    n_rings: int = 16,
    width: int = 1024,
    vfov=(-15.0, 15.0),
    max_range: float = 150.0,
    distortion: bool = True,
    noise: float = 0.0,
    key=None,
) -> Sweep:
    """Simulate one organized sweep.

    Each azimuth column is cast from the pose interpolated at its rel_time
    when ``distortion`` — reproducing the rolling-shutter effect LOAM's
    motion compensation (transformToStart) exists to undo.  Points are
    returned in the *start* pose's sensor frame composed with the residual
    motion, i.e. exactly what a real scanner delivers.
    """
    elev = jnp.deg2rad(jnp.linspace(vfov[0], vfov[1], n_rings))
    azim = jnp.linspace(0.0, 2 * jnp.pi, width, endpoint=False)
    rel_t = jnp.broadcast_to((azim / (2 * jnp.pi))[None, :], (n_rings, width))

    ce, se_ = jnp.cos(elev)[:, None], jnp.sin(elev)[:, None]
    ca, sa = jnp.cos(azim)[None, :], jnp.sin(azim)[None, :]
    # spin about +y: direction in sensor frame
    dirs = jnp.stack(
        [ce * ca, jnp.broadcast_to(se_, (n_rings, width)), ce * sa], axis=-1
    )  # [R, W, 3]

    if distortion:
        # interpolate the pose per column on the se(3) geodesic
        xi = se3.se3_log(se3.inverse(pose_start) @ pose_end)     # [6]
        frac = rel_t[0]                                           # [W]
        T_col = se3.se3_exp(frac[:, None] * xi[None, :])          # [W,4,4]
        T_col = pose_start @ T_col
        R_col = T_col[:, :3, :3]                                  # [W,3,3]
        t_col = T_col[:, :3, 3]
        dirs_w = jnp.einsum("wij,rwj->rwi", R_col, dirs)
        orig_w = jnp.broadcast_to(t_col[None, :, :], dirs.shape)
    else:
        R0 = pose_start[:3, :3]
        dirs_w = dirs @ R0.T
        orig_w = jnp.broadcast_to(pose_start[:3, 3], dirs.shape)

    t, hit = ray_cast(world, orig_w, dirs_w, max_range)
    pts_world = orig_w + t[..., None] * dirs_w
    if noise > 0.0 and key is not None:
        pts_world = pts_world + noise * jax.random.normal(key, pts_world.shape)

    # back to the capture sensor frame (what the device outputs)
    if distortion:
        Rt = jnp.swapaxes(R_col, -1, -2)
        pts_sensor = jnp.einsum("wij,rwj->rwi", Rt, pts_world - t_col[None, :, :])
    else:
        pts_sensor = (pts_world - pose_start[:3, 3]) @ pose_start[:3, :3]

    return Sweep(xyz=pts_sensor.astype(jnp.float32), mask=hit, rel_time=rel_t)


def figure_eight_trajectory(n_poses: int, scale=8.0, height=1.5, period=60.0):
    """Ground-truth trajectory: smooth figure-eight inside the room.

    Returns [n_poses, 4, 4] float32 sensor->world poses (numpy, host side).
    """
    s = np.linspace(0, 2 * np.pi * 0.8, n_poses)
    x = scale * np.sin(s)
    z = scale * np.sin(s) * np.cos(s)
    y = np.full_like(x, height)
    dx = np.gradient(x)
    dz = np.gradient(z)
    yaw = np.arctan2(dz, dx)
    poses = np.zeros((n_poses, 4, 4), np.float32)
    for i in range(n_poses):
        c, si = np.cos(yaw[i]), np.sin(yaw[i])
        # rotation about y (up)
        poses[i] = np.array(
            [
                [c, 0, si, x[i]],
                [0, 1, 0, y[i]],
                [-si, 0, c, z[i]],
                [0, 0, 0, 1],
            ],
            np.float32,
        )
    return poses
