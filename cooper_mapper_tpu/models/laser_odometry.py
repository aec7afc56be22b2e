"""LaserOdometry pipeline stage — stateful scan-to-scan tracking.

Re-design of ``LaserOdometry``
(/root/reference/L_SLAM/src/odometry/LaserOdometry.{h,cpp}): holds the
previous sweep's less-sharp/less-flat clouds, solves the in-sweep motion
twist against them (warm-started from the previous motion — the reference
keeps ``_transform`` across sweeps as a constant-velocity prior), accumulates
the global odometry pose, and projects the current clouds to the sweep end as
the next frame's reference (process(), LaserOdometry.cpp:288-326).

The accumulated pose uses the *exact* relative motion implied by the solved
twist (utils/twist.to_relative_motion) rather than the reference's
approximate TZYX re-composition (transformUpdate, :649-653) — same fixed
point, better-conditioned trajectory.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import OdometryConfig
from ..ops import odometry as odometry_ops
from ..ops.features import FeatureClouds
from ..utils import cloud as cloud_lib
from ..utils import se3, twist
from ..utils.cloud import Cloud


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OdometryState:
    last_corner: Cloud   # previous sweep less-sharp, projected to sweep end
    last_surf: Cloud     # previous sweep less-flat, projected to sweep end
    x_prev: jax.Array    # [6] last solved twist (constant-velocity warm start)
    T_sum: jax.Array     # [4,4] accumulated odometry pose


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OdometryOutput:
    T_sum: jax.Array        # pose after this sweep
    x: jax.Array            # solved in-sweep twist
    n_matched: jax.Array
    converged: jax.Array
    corner_for_map: Cloud   # end-projected clouds handed to the mapper
    surf_for_map: Cloud


def create(corner_capacity: int, surf_capacity: int) -> OdometryState:
    return OdometryState(
        last_corner=cloud_lib.empty(corner_capacity),
        last_surf=cloud_lib.empty(surf_capacity),
        x_prev=jnp.zeros(6, jnp.float32),
        T_sum=jnp.eye(4, dtype=jnp.float32),
    )


def _project_to_end(x, c: Cloud) -> Cloud:
    xyz = twist.warp_to_end(x, c.xyz, c.rel_time)
    return cloud_lib.Cloud(
        jnp.where(c.mask[:, None], xyz, cloud_lib.FAR), c.mask, c.ring,
        jnp.zeros_like(c.rel_time),
    )


@partial(jax.jit, static_argnames=("cfg", "parity_mode"))
def init_step(state: OdometryState, fc: FeatureClouds, cfg: OdometryConfig,
              parity_mode: bool = False) -> OdometryState:
    """First sweep: store clouds, no solve (process(), :295-303)."""
    return OdometryState(
        last_corner=cloud_lib.compact(fc.less_sharp, state.last_corner.capacity),
        last_surf=cloud_lib.compact(fc.less_flat, state.last_surf.capacity),
        x_prev=state.x_prev,
        T_sum=state.T_sum,
    )


@partial(jax.jit, static_argnames=("cfg", "parity_mode"))
def step(state: OdometryState, fc: FeatureClouds, cfg: OdometryConfig,
         parity_mode: bool = False):
    """One odometry sweep: solve, accumulate, roll reference clouds."""
    x, diag = odometry_ops.odometry_solve(
        fc.sharp, fc.flat, state.last_corner, state.last_surf,
        state.x_prev, cfg, parity_mode,
    )
    M = twist.to_relative_motion(x)
    T_new = state.T_sum @ M

    corner_end = _project_to_end(x, fc.less_sharp)
    surf_end = _project_to_end(x, fc.less_flat)

    new_state = OdometryState(
        last_corner=cloud_lib.compact(corner_end, state.last_corner.capacity),
        last_surf=cloud_lib.compact(surf_end, state.last_surf.capacity),
        x_prev=x,
        T_sum=T_new,
    )
    out = OdometryOutput(
        T_sum=T_new,
        x=x,
        n_matched=diag.n_matched,
        converged=diag.converged,
        corner_for_map=corner_end,
        surf_for_map=surf_end,
    )
    return new_state, out
