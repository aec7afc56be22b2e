"""Reactive wander controller in the simulated world.

Functional equivalent of the reference's ``control`` package
(/root/reference/control/src/wander.cpp:24-72 — roam forward, turn away when
an obstacle is near) driven by simulated range readings, with the SLAM
pipeline tracking the resulting trajectory.  Demonstrates closed-loop use:
controller -> motion -> sweeps -> SLAM.

Run:  python examples/demo_wander.py [n_steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from cooper_mapper_tpu.config import (
    MapConfig, MatcherConfig, PipelineConfig, RegistrationConfig, ScanMatchConfig,
)
from cooper_mapper_tpu.io import evaluation, sim
from cooper_mapper_tpu.models.pipeline import SlamPipeline


def wander_step(world, pose, speed=0.4, clearance=2.5):
    """One controller tick: move forward; turn away from near obstacles.

    The 'range_reporter' equivalent: cast a fan of horizontal rays and steer
    by the freest direction (wander.cpp's obstacle check).
    """
    headings = np.deg2rad(np.linspace(-60, 60, 9))
    R = pose[:3, :3]
    dirs = np.stack(
        [np.cos(headings), np.zeros_like(headings), np.sin(headings)], -1
    ) @ R.T
    origins = np.broadcast_to(pose[:3, 3], dirs.shape)
    t, hit = sim.ray_cast_np(world, origins, dirs) if hasattr(sim, "ray_cast_np") else (
        np.asarray(sim.ray_cast(world, jnp.asarray(origins), jnp.asarray(dirs))[0]),
        None,
    )
    front = t[len(t) // 2]
    if front < clearance:
        # turn toward the freest ray
        yaw = headings[int(np.argmax(t))]
    else:
        yaw = 0.05 * headings[int(np.argmax(t))]
    c, s = np.cos(yaw), np.sin(yaw)
    step = np.array(
        [[c, 0, s, 0.0], [0, 1, 0, 0], [-s, 0, c, min(speed, max(front - 1.5, 0.1))],
         [0, 0, 0, 1]], np.float32,
    )
    return pose @ step


def main(n_steps: int = 15):
    cfg = PipelineConfig(
        registration=RegistrationConfig(n_rings=16, max_points_per_ring=768),
        scan_match=ScanMatchConfig(score_threshold=50.0),
        feature_map=MapConfig(
            n_cubes=(7, 3, 7), cube_size=20.0,
            corner_cube_capacity=2048, surf_cube_capacity=4096,
            surround_corner_capacity=8192, surround_surf_capacity=16384,
            valid_distance=60.0,
        ),
        matcher=MatcherConfig(max_frame_corner=2048, max_frame_surf=4096),
        mapping_stride=2,
    )
    world = sim.make_room_world(size=(24.0, 4.0, 30.0), n_pillars=6, seed=4)
    pose = np.eye(4, dtype=np.float32)
    pose[1, 3] = 1.5
    poses = [pose]
    for _ in range(n_steps):
        poses.append(wander_step(world, poses[-1]))

    pipe = SlamPipeline(cfg, mode="mapping")
    for i in range(n_steps):
        r = pipe.process(
            sim.scan_sweep(world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
                           n_rings=16, width=768)
        )
        print(f"step {i:2d}: pos={np.round(r.merged_pose[:3, 3], 2)}")

    est = np.stack(pipe.trajectory)
    gt = np.stack([np.linalg.inv(poses[0]) @ p for p in poses[:n_steps]])
    stats = evaluation.ate(est[:, :3, 3], gt[:, :3, 3])
    print(f"\nwander ATE rmse: {stats.rmse:.3f} m over {n_steps} steps")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
