"""Scan-registration front ends.

Re-design of ``MultiScanRegistration`` / ``OrganisedScanRegistration``
(/root/reference/L_SLAM/src/odometry/MultiScanRegistration.{h,cpp},
Organi{s,z}edScanRegistration.{h,cpp}): turn raw device output into the
organized [rings, W] Sweep grid and run the feature kernel.

* organized input (row = ring, col = azimuth, OrganisedScanRegistration):
  direct passthrough with ring-native rel_time = col / width
  (OrganizedScanRegistration.cpp:111) and blind-radius cull (:121-123).
* unorganized input (MultiScanRegistration): LOAM axis remap
  (x,y,z) <- (y,z,x) (MultiScanRegistration.cpp:120-123), vertical angle ->
  ring (linear mapper or Pandar40 table, MultiScanRegistration.h:49-111),
  azimuth -> in-sweep relative time (:144-168), ring binning.  This runs
  host-side in numpy — it is per-sensor data marshalling, not compute.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RegistrationConfig
from ..ops.features import Sweep
from ..utils import se3


@dataclasses.dataclass(frozen=True)
class LinearRingMapper:
    """Linear vertical-angle -> ring mapping (MultiScanMapper)."""

    lower_deg: float
    upper_deg: float
    n_rings: int

    def ring(self, angle_deg):
        f = (self.n_rings - 1) / (self.upper_deg - self.lower_deg)
        return np.round((angle_deg - self.lower_deg) * f).astype(np.int32)


VLP16 = LinearRingMapper(-15.0, 15.0, 16)
HDL32 = LinearRingMapper(-30.67, 10.67, 32)
HDL64E = LinearRingMapper(-24.9, 2.0, 64)

# Pandar40 vendor elevation table (angle_pandar, lidar_type.h:13-53; the
# vendor lists rings top-down and scanID_pandar40 assigns ring = 39 - i, so
# the ascending-order table below gives the same ring ids via argmin).
_PANDAR40_ANGLES = np.array([
    -15.444, -14.543, -13.63, -12.705, -11.772, -10.826, -9.871, -8.908,
    -7.934, -6.957, -5.974, -5.647, -5.311, -4.986, -4.657, -4.321,
    -3.996, -3.663, -3.327, -3.0, -2.667, -2.331, -2.001, -1.667,
    -1.334, -1.001, -0.667, -0.334, 0.0, 0.333, 0.667, 1.001,
    1.333, 1.667, 2.001, 2.999, 3.996, 4.988, 5.976, 6.96,
])


@dataclasses.dataclass(frozen=True)
class TableRingMapper:
    angles_deg: tuple

    @property
    def n_rings(self):
        return len(self.angles_deg)

    def ring(self, angle_deg):
        table = np.asarray(self.angles_deg)
        return np.argmin(np.abs(np.asarray(angle_deg)[..., None] - table), axis=-1).astype(
            np.int32
        )


PANDAR40 = TableRingMapper(tuple(_PANDAR40_ANGLES.tolist()))


def organize_unordered(
    points: np.ndarray,
    cfg: RegistrationConfig,
    mapper: LinearRingMapper | TableRingMapper = VLP16,
    axis_remap: bool = True,
) -> Sweep:
    """Unorganized [N, 3] device points -> organized Sweep grid.

    Reproduces MultiScanRegistration::process (MultiScanRegistration.cpp:95-200):
    axis remap, NaN/short-range cull, ring id from vertical angle, azimuth ->
    rel_time, ring-major rebuild sorted by azimuth.
    """
    pts = np.asarray(points, np.float32)
    if axis_remap:
        pts = pts[:, [1, 2, 0]]  # (x,y,z) <- (y,z,x)

    finite = np.isfinite(pts).all(-1)
    rng = np.linalg.norm(pts, axis=-1)
    ok = finite & (rng > cfg.min_range) & (rng < cfg.max_range)
    pts = pts[ok]

    # vertical angle about the spin (y) axis; azimuth in the x-z plane
    horiz = np.sqrt(pts[:, 0] ** 2 + pts[:, 2] ** 2)
    v_angle = np.rad2deg(np.arctan2(pts[:, 1], horiz))
    ring = mapper.ring(v_angle)
    ring_ok = (ring >= 0) & (ring < cfg.n_rings)
    pts, ring = pts[ring_ok], ring[ring_ok]

    azim = np.arctan2(pts[:, 2], pts[:, 0])
    rel = (azim - azim.min()) % (2 * np.pi) / (2 * np.pi)

    R, W = cfg.n_rings, cfg.max_points_per_ring
    xyz = np.zeros((R, W, 3), np.float32)
    mask = np.zeros((R, W), bool)
    rel_time = np.zeros((R, W), np.float32)
    for r in range(R):
        sel = ring == r
        order = np.argsort(rel[sel])
        p = pts[sel][order][:W]
        t = rel[sel][order][:W]
        n = len(p)
        xyz[r, :n] = p
        mask[r, :n] = True
        rel_time[r, :n] = t
    return Sweep(
        xyz=jnp.asarray(xyz), mask=jnp.asarray(mask), rel_time=jnp.asarray(rel_time)
    )


def organize_grid(
    xyz: np.ndarray,
    cfg: RegistrationConfig,
    valid: Optional[np.ndarray] = None,
    scan_period_fraction: bool = True,
) -> Sweep:
    """Organized [R, W, 3] input -> Sweep (OrganisedScanRegistration)."""
    xyz = np.asarray(xyz, np.float32)
    R, W = xyz.shape[:2]
    if valid is None:
        valid = np.isfinite(xyz).all(-1)
    rng = np.linalg.norm(xyz, axis=-1)
    valid = valid & (rng > cfg.min_range) & (rng < cfg.max_range)
    rel = np.broadcast_to(np.arange(W, dtype=np.float32)[None, :] / W, (R, W))
    return Sweep(
        xyz=jnp.asarray(np.where(valid[..., None], xyz, 1e6)),
        mask=jnp.asarray(valid),
        rel_time=jnp.asarray(rel.copy()),
    )


# ---------------------------------------------------------------------------
# IMU de-warp (ScanRegistration.cpp:89-188)
#
# The reference integrates IMU samples into a position/velocity history
# (handleIMUMessage, :89-120), interpolates the IMU state at each point's
# capture time (interpolateIMUStateFor, :171-188), and shifts every point by
# the *nonlinear* part of the IMU motion — the deviation from constant
# velocity over the sweep (setIMUTransformFor + transformToStartIMU,
# :150-169).  The constant-velocity part is what the odometry twist solves
# for; the de-warp removes what it can't model.
# ---------------------------------------------------------------------------

GRAVITY = 9.81


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImuHistory:
    """Integrated IMU state history (the reference's _imuHistory ring)."""

    stamp: jax.Array  # [M] seconds (sorted; invalid entries masked)
    rpy: jax.Array    # [M, 3] roll/pitch/yaw in the LOAM working frame
    pos: jax.Array    # [M, 3] integrated position
    vel: jax.Array    # [M, 3] integrated velocity
    mask: jax.Array   # [M]


def integrate_imu_history(stamp, acc_sensor, rpy, mask=None) -> ImuHistory:
    """Accumulate IMU position/velocity (handleIMUMessage, :89-120).

    ``acc_sensor`` is the raw accelerometer reading in sensor axis order
    (x, y, z); the reference remaps to the LOAM frame and removes gravity
    using the IMU's own roll/pitch (:96-99), then rotates to world with
    rotateZXY(roll, pitch, yaw) and integrates (:108-117).
    """
    stamp = jnp.asarray(stamp, jnp.float32)
    acc_sensor = jnp.asarray(acc_sensor, jnp.float32)
    rpy = jnp.asarray(rpy, jnp.float32)
    if mask is None:
        mask = jnp.ones(stamp.shape, bool)
    roll, pitch, yaw = rpy[:, 0], rpy[:, 1], rpy[:, 2]
    # axis remap (y,z,x) + gravity removal in the tilted frame (:96-99)
    acc = jnp.stack(
        [
            acc_sensor[:, 1] - jnp.sin(roll) * jnp.cos(pitch) * GRAVITY,
            acc_sensor[:, 2] - jnp.cos(roll) * jnp.cos(pitch) * GRAVITY,
            acc_sensor[:, 0] + jnp.sin(pitch) * GRAVITY,
        ],
        axis=-1,
    )
    acc_w = se3.rotate_zxy(acc, roll, pitch, yaw)  # rotateZXY(acc, r, p, y)

    dt = jnp.diff(stamp, prepend=stamp[:1])
    dt = jnp.where(mask, dt, 0.0)

    def step(carry, inp):
        pos_p, vel_p = carry
        a, d = inp
        pos = pos_p + vel_p * d + 0.5 * a * d * d
        vel = vel_p + a * d
        return (pos, vel), (pos, vel)

    (_, _), (pos, vel) = jax.lax.scan(
        step, (jnp.zeros(3), jnp.zeros(3)), (acc_w, dt)
    )
    return ImuHistory(stamp=stamp, rpy=rpy, pos=pos, vel=vel, mask=mask)


def _interp_state(hist: ImuHistory, t):
    """IMU state at times t [...] (interpolateIMUStateFor, :171-188)."""
    big = jnp.float32(1e30)
    stamps = jnp.where(hist.mask, hist.stamp, big)
    n_valid = jnp.sum(hist.mask.astype(jnp.int32))
    # first sample with stamp >= t (the reference's idx after its while loop)
    idx = jnp.searchsorted(stamps, t, side="left")
    idx = jnp.clip(idx, 0, jnp.maximum(n_valid - 1, 0))
    prev = jnp.clip(idx - 1, 0, jnp.maximum(n_valid - 1, 0))

    take = lambda a, i: jnp.take(a, i, axis=0)
    t_hi, t_lo = take(hist.stamp, idx), take(hist.stamp, prev)
    # beyond the history (t > last stamp) or before it: take the sample as-is
    out_of_range = (idx == 0) | (t > t_hi)
    denom = jnp.where(t_hi > t_lo, t_hi - t_lo, 1.0)
    ratio = jnp.where(out_of_range, 0.0, (t_hi - t) / denom)  # weight of prev

    def lerp(a):
        hi, lo = take(a, idx), take(a, prev)
        return hi * (1.0 - ratio[..., None]) + lo * ratio[..., None]

    rpy_hi, rpy_lo = take(hist.rpy, idx), take(hist.rpy, prev)
    # yaw wrap handling (IMUState::interpolate, ScanRegistration.h:157-165)
    yaw_hi, yaw_lo = rpy_hi[..., 2], rpy_lo[..., 2]
    yaw_lo = jnp.where(yaw_hi - yaw_lo > jnp.pi, yaw_lo + 2 * jnp.pi, yaw_lo)
    yaw_lo = jnp.where(yaw_hi - yaw_lo < -jnp.pi, yaw_lo - 2 * jnp.pi, yaw_lo)
    rpy_lo = rpy_lo.at[..., 2].set(yaw_lo)
    rpy = rpy_hi * (1.0 - ratio[..., None]) + rpy_lo * ratio[..., None]
    return rpy, lerp(hist.pos), lerp(hist.vel)


def imu_dewarp(sweep: Sweep, hist: ImuHistory, scan_time: float,
               scan_period: float = 0.1, sweep_start: Optional[float] = None) -> Sweep:
    """Shift every point by the nonlinear IMU motion (transformToStartIMU).

    Each point captured at ``t = scan_time + rel_time * scan_period`` is
    rotated into the world IMU frame with its own interpolated attitude,
    shifted by ``pos(t) - pos(start) - vel(start) * relSweepTime``
    (setIMUTransformFor, :150-155), and rotated back into the sweep-start
    IMU frame (:158-169).  Returns a new Sweep in the start frame.
    """
    if sweep_start is None:
        sweep_start = scan_time
    t_start = jnp.float32(scan_time)
    rpy_s, pos_s, vel_s = _interp_state(hist, t_start[None])
    roll_s, pitch_s, yaw_s = rpy_s[0, 0], rpy_s[0, 1], rpy_s[0, 2]

    t_p = scan_time + sweep.rel_time * scan_period            # [R, W]
    rel_sweep = (scan_time - sweep_start) + sweep.rel_time * scan_period
    rpy_c, pos_c, _ = _interp_state(hist, t_p)
    shift = pos_c - pos_s[0] - vel_s[0] * rel_sweep[..., None]

    p_w = se3.rotate_zxy(
        sweep.xyz, rpy_c[..., 0], rpy_c[..., 1], rpy_c[..., 2]
    )
    p_new = se3.rotate_yxz(p_w + shift, -yaw_s, -pitch_s, -roll_s)

    has_imu = jnp.any(hist.mask)
    xyz = jnp.where(has_imu & sweep.mask[..., None], p_new, sweep.xyz)
    return Sweep(xyz=xyz, mask=sweep.mask, rel_time=sweep.rel_time)
