"""Sharded-map mapping-step throughput (SURVEY §5 axis (b): cube shards).

Measures the full LaserMapping step (recenter -> surround gather ->
scan-match solve -> insert) against the DEVICE-SHARDED cube map
(maps/sharded_map.py) vs the single-device map, on whatever mesh the
backend offers (1 real TPU chip, or 8 virtual CPU devices under the test
env).  The sharded path adds one all_gather per step; its value is map
CAPACITY scaling (cube arrays shard over HBM), so the interesting number is
the overhead at equal work.

Usage: python benchmarks/bench_sharded_map.py [n_steps] [mode]
  mode: both | single | sharded
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import (
    MapConfig, MatcherConfig, RegistrationConfig, ScanMatchConfig,
)
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.maps import feature_map as fm
from cooper_mapper_tpu.maps import sharded_map as smap
from cooper_mapper_tpu.models import laser_mapping
from cooper_mapper_tpu.ops import features
from cooper_mapper_tpu.parallel import mesh as mesh_lib

def _map_cfg():
    if jax.default_backend() == "tpu":
        return MapConfig(
            n_cubes=(21, 11, 21), cube_size=50.0,
            corner_cube_capacity=4096, surf_cube_capacity=8192,
            surround_corner_capacity=32768, surround_surf_capacity=65536,
        )
    # CPU smoke scale: the virtual 8-device mesh time-slices few physical
    # cores, and full-size per-device gathers push one participant past the
    # 40 s collective-rendezvous termination timeout
    return MapConfig(
        n_cubes=(7, 5, 7), cube_size=20.0,
        corner_cube_capacity=1024, surf_cube_capacity=2048,
        surround_corner_capacity=8192, surround_surf_capacity=16384,
        valid_distance=60.0,
    )


MAP_CFG = _map_cfg()
SM_CFG = ScanMatchConfig(score_threshold=50.0)
M_CFG = MatcherConfig()


def build_frames(n_steps, width=1024, n_rings=16):
    world = sim.make_room_world(seed=11)
    cfg_reg = RegistrationConfig(n_rings=n_rings, max_points_per_ring=width)
    p = np.eye(4, dtype=np.float32)
    p[1, 3] = 1.5
    step = np.eye(4, dtype=np.float32)
    step[2, 3] = 0.4
    frames, poses = [], []
    for k in range(n_steps):
        p2 = p @ step
        fc = features.extract_features(
            sim.scan_sweep(world, jnp.asarray(p), jnp.asarray(p2),
                           n_rings=n_rings, width=width), cfg_reg)
        frames.append((fc.less_sharp, fc.less_flat))
        poses.append(jnp.asarray(p2))
        p = p2
    return frames, poses


def run_single(frames, poses):
    # per-step device_get of the pose AND a map scalar: the axon relay can
    # acknowledge block_until_ready without real completion (CLAUDE.md), so
    # every step is forced through a host fetch that depends on both the
    # solve and the insert
    matcher = laser_mapping.create_matcher()
    state = fm.create(MAP_CFG)
    dts = []
    for (c, s), L in zip(frames, poses):
        t0 = time.perf_counter()
        matcher, state, mo = laser_mapping.mapping_step(
            matcher, state, c, s, L, SM_CFG, M_CFG, MAP_CFG)
        jax.device_get((mo.W[0, 0], state.surf.count[0]))
        dts.append(time.perf_counter() - t0)
    return dts, state


def run_sharded(frames, poses, mesh):
    matcher = laser_mapping.create_matcher()
    state = smap.create_sharded(MAP_CFG, mesh)
    dts = []
    for (c, s), L in zip(frames, poses):
        t0 = time.perf_counter()
        matcher, state, mo = smap.mapping_step(
            matcher, state, c, s, L, SM_CFG, M_CFG, MAP_CFG, mesh)
        jax.device_get((mo.W[0, 0], state.surf.count[0]))
        dts.append(time.perf_counter() - t0)
    return dts, state


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    mesh = mesh_lib.make_mesh()
    ndev = mesh.devices.size
    frames, poses = build_frames(n_steps + 1)

    out = {"n_steps": n_steps, "n_devices": ndev,
           "backend": jax.default_backend()}
    med = lambda v: sorted(v)[len(v) // 2]
    if mode in ("both", "single"):
        # warm the jit caches on the first frame, then time the rest
        run_single(frames[:1], poses[:1])
        dts, st = run_single(frames[1:], poses[1:])
        out["single_ms_per_step"] = round(med(dts) * 1e3, 1)
        out["single_surf_pts"] = int(jnp.sum(st.surf.count))
    if mode in ("both", "sharded"):
        run_sharded(frames[:1], poses[:1], mesh)
        dts, st = run_sharded(frames[1:], poses[1:], mesh)
        out["sharded_ms_per_step"] = round(med(dts) * 1e3, 1)
        out["sharded_surf_pts"] = int(jnp.sum(st.surf.count))
        # the scaling win: per-device HBM for the map arrays
        bytes_total = sum(
            a.nbytes for a in jax.tree.leaves((st.corner, st.surf)))
        out["map_bytes_per_device_mb"] = round(bytes_total / ndev / 2**20, 1)
    print(out)


if __name__ == "__main__":
    main()
