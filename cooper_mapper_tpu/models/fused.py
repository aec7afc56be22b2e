"""Single-dispatch SLAM sweep steps: registration -> odometry [-> mapping]
fused into ONE jitted device program with donated state.

The reference's nodelet deployment exists precisely to kill inter-stage
copies ("Support ROS nodelet to avoid extra data & memory copying cost",
/root/reference/L_SLAM/README.md; registry nodelets.xml:1-47).  The
SlamPipeline host loop already keeps numerics on device but still issues one
dispatch per stage with pose transfers between them — through a remote
device (the axon relay) each dispatch costs a round trip that dwarfs the
compute.  These fused steps collapse a sweep into a single dispatch whose
only host traffic is the returned pose row, and donate the carried state
(odometry reference clouds + matcher poses + the cube map) so XLA updates
it in place.

Used by benchmarks/bench_realtime.py to measure on-device per-sweep latency
against LOAM's real-time budget (10 Hz odometry / 1 Hz mapping,
BASELINE.md); usable directly for single-stream deployments that do not
need the SlamPipeline's host-side extras (graph, UKF, paging).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..maps import feature_map as fm
from ..ops import features as feat_ops
from ..ops.features import Sweep
from . import laser_mapping, laser_odometry


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedState:
    odo: laser_odometry.OdometryState
    matcher: laser_mapping.MatcherState
    map: fm.FeatureMapState


def create(cfg: PipelineConfig,
           map_state: fm.FeatureMapState | None = None) -> FusedState:
    r = cfg.registration
    return FusedState(
        odo=laser_odometry.create(r.max_less_sharp, r.max_less_flat),
        matcher=laser_mapping.create_matcher(),
        map=map_state if map_state is not None else fm.create(cfg.feature_map),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def init_sweep(state: FusedState, sweep: Sweep, cfg: PipelineConfig) -> FusedState:
    """First sweep: extract + store reference clouds, no solve."""
    fc = feat_ops.extract_features(sweep, cfg.registration)
    odo = laser_odometry.init_step(state.odo, fc, cfg.odometry)
    return FusedState(odo=odo, matcher=state.matcher, map=state.map)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def odometry_sweep(state: FusedState, sweep: Sweep, cfg: PipelineConfig):
    """Registration + scan-to-scan solve + high-rate merged pose, one
    dispatch.  Returns (state', merged_pose [4,4], n_matched)."""
    fc = feat_ops.extract_features(sweep, cfg.registration)
    odo, out = laser_odometry.step(state.odo, fc, cfg.odometry)
    merged = laser_mapping.merged_pose(state.matcher, out.T_sum)
    state = FusedState(odo=odo, matcher=state.matcher, map=state.map)
    return state, merged, out.n_matched


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def mapping_sweep(state: FusedState, sweep: Sweep, cfg: PipelineConfig):
    """Registration + odometry + full scan-to-map step (recenter, surround
    gather, GN solve, gate, insert), one dispatch.  Returns
    (state', mapped_pose [4,4], success)."""
    fc = feat_ops.extract_features(sweep, cfg.registration)
    odo, out = laser_odometry.step(state.odo, fc, cfg.odometry)
    matcher, map_state, mo = laser_mapping.mapping_step(
        state.matcher, state.map, out.corner_for_map, out.surf_for_map,
        out.T_sum, cfg.scan_match, cfg.matcher, cfg.feature_map,
    )
    state = FusedState(odo=odo, matcher=matcher, map=map_state)
    return state, mo.W, mo.result.success
