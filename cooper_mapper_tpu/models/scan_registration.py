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

import jax.numpy as jnp
import numpy as np

from ..config import RegistrationConfig
from ..ops.features import Sweep


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

# Pandar40 uses a non-linear table (lidar_type.h:6-104); approximate entries
# for the functional equivalent — a real deployment loads the vendor table.
_PANDAR40_ANGLES = np.concatenate(
    [np.linspace(-25.0, -6.0, 10), np.linspace(-5.0, 2.0, 24), np.linspace(3.0, 15.0, 6)]
)


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
