"""Experiment: figure-eight mapping-amplification (VERDICT r2 weak #4).

Scan-to-map on the figure-eight trajectory amplifies odometry drift ~2x
(0.76 m vs 0.40 m odometry-only) because between dedup passes the newest
frames' duplicate points dominate the 5-NN correspondences, degenerating
scan-to-map toward scan-to-last-scan.  The reference re-voxelizes the active
cubes EVERY mapping pass (downsizeValidCloud called from the update path,
FeatureMap.h:289-306), merging new observations into per-voxel centroids.

Variants measured here (CPU, same workload as tests/test_pipeline.py
TestFigureEightRun):
  default    : dedup_stride=4 (the round-2 default)
  stride1    : dedup_stride=1 (reference parity: dedup every pass)
  odom_only  : mapping disabled (the 0.40 m baseline)

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/exp_fig8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import (
    MapConfig, MatcherConfig, PipelineConfig, RegistrationConfig,
    ScanMatchConfig,
)
from cooper_mapper_tpu.io import sim, evaluation
from cooper_mapper_tpu.models.pipeline import SlamPipeline


def small_cfg(dedup_policy="centroid", **matcher_kw):
    return PipelineConfig(
        registration=RegistrationConfig(n_rings=16, max_points_per_ring=512),
        scan_match=ScanMatchConfig(score_threshold=50.0),
        feature_map=MapConfig(
            n_cubes=(7, 3, 7), cube_size=20.0,
            corner_cube_capacity=1024, surf_cube_capacity=2048,
            surround_corner_capacity=8192, surround_surf_capacity=16384,
            valid_distance=60.0, dedup_policy=dedup_policy,
        ),
        matcher=MatcherConfig(max_frame_corner=2048, max_frame_surf=4096,
                              **matcher_kw),
        mapping_stride=2,
    )


def run_loc_gt(cfg, n=72, warped=True):
    """Localization mode against a map built by inserting every frame at its
    GROUND-TRUTH pose: isolates the solve from map-construction error.  If
    this tracks well, the scan-match is healthy and the amplification lives
    in the insert-at-estimated-pose feedback loop.

    warped=False scans each sweep statically at the end pose (no intra-sweep
    motion): separates dewarp-deformation error from solve error.
    """
    import jax

    from cooper_mapper_tpu.maps import feature_map as fm
    from cooper_mapper_tpu.models import laser_mapping as lmap
    from cooper_mapper_tpu.ops import features as feat_ops

    world = sim.make_room_world(size=(30.0, 4.0, 40.0), n_pillars=8, seed=5)
    poses = sim.figure_eight_trajectory(n + 1, scale=6.0)
    gt_rel = np.stack([np.linalg.inv(poses[0]) @ p for p in poses[:n]])

    def make_sweep(i):
        a = poses[i] if warped else poses[i + 1]
        return sim.scan_sweep(
            world, jnp.asarray(a), jnp.asarray(poses[i + 1]),
            n_rings=16, width=512,
        )

    # the GT map is built from STATIC (unwarped) scans at the start poses:
    # inserting raw warped features would bake ~half a sweep's motion of
    # smear+offset into the map (measured as a flat 0.3-0.5 m solve bias)
    state = fm.create(cfg.feature_map)
    for i in range(n):
        static_sweep = sim.scan_sweep(
            world, jnp.asarray(poses[i]), jnp.asarray(poses[i]),
            n_rings=16, width=512,
        )
        fc = feat_ops.extract_features(static_sweep, cfg.registration)
        corner_ds, surf_ds = lmap.prepare_frame(
            fc.less_sharp, fc.less_flat, cfg.matcher
        )
        T = jnp.asarray(gt_rel[i], jnp.float32)
        state = fm.add_feature_cloud(
            state, lmap._to_world(corner_ds, T), lmap._to_world(surf_ds, T),
            cfg.feature_map,
        )
    state = fm.dedup_active(state, jnp.zeros(3), cfg.feature_map)

    pipe = SlamPipeline(cfg, mode="localization", map_state=state)
    t0 = time.time()
    n_ok = n_solves = 0
    for i in range(n):
        r = pipe.process(make_sweep(i))
        if r.mapping_success is not None:
            n_solves += 1
            n_ok += bool(r.mapping_success)
        if os.environ.get("FIG8_VERBOSE"):
            err = np.linalg.norm(r.merged_pose[:3, 3] - gt_rel[i][:3, 3])
            oerr = np.linalg.norm(r.odom_pose[:3, 3] - gt_rel[i][:3, 3])
            print(f"  i={i:3d} ok={r.mapping_success} "
                  f"|merged-gt|={err:.3f} |odom-gt|={oerr:.3f}", flush=True)
    wall = time.time() - t0
    est = np.stack(pipe.trajectory)
    odo = np.stack(pipe.odom_trajectory)
    merged = evaluation.ate(est[:, :3, 3], gt_rel[:, :3, 3]).rmse
    odom = evaluation.ate(odo[:, :3, 3], gt_rel[:, :3, 3]).rmse
    # end-of-sweep convention: trajectory[i] is the pose AFTER sweep i
    # (features are end-projected), so the matching gt index is i+1
    gt_end = np.stack([np.linalg.inv(poses[0]) @ p for p in poses[1:n + 1]])
    merged_end = evaluation.ate(est[:, :3, 3], gt_end[:, :3, 3]).rmse
    odom_end = evaluation.ate(odo[:, :3, 3], gt_end[:, :3, 3]).rmse
    merged_end_al = evaluation.ate(est[:, :3, 3], gt_end[:, :3, 3], align=True).rmse
    odom_end_al = evaluation.ate(odo[:, :3, 3], gt_end[:, :3, 3], align=True).rmse
    print(f"  loc_gt warped={warped}: solves accepted {n_ok}/{n_solves}; "
          f"END ate: merged={merged_end:.3f} odom={odom_end:.3f}; "
          f"END+aligned: merged={merged_end_al:.3f} odom={odom_end_al:.3f}")
    return merged, odom, wall


def run(cfg, n=72, use_mapping=True):
    world = sim.make_room_world(size=(30.0, 4.0, 40.0), n_pillars=8, seed=5)
    poses = sim.figure_eight_trajectory(n + 1, scale=6.0)
    pipe = SlamPipeline(cfg, mode="mapping")
    t0 = time.time()
    for i in range(n):
        sweep = sim.scan_sweep(
            world, jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]),
            n_rings=16, width=512,
        )
        pipe.process(sweep)
    wall = time.time() - t0
    gt_rel = np.stack([np.linalg.inv(poses[0]) @ p for p in poses[:n]])
    est = np.stack(pipe.trajectory)
    odo = np.stack(pipe.odom_trajectory)
    merged = evaluation.ate(est[:, :3, 3], gt_rel[:, :3, 3]).rmse
    odom = evaluation.ate(odo[:, :3, 3], gt_rel[:, :3, 3]).rmse
    gt_end = np.stack([np.linalg.inv(poses[0]) @ p for p in poses[1:n + 1]])
    merged_end = evaluation.ate(est[:, :3, 3], gt_end[:, :3, 3]).rmse
    odom_end = evaluation.ate(odo[:, :3, 3], gt_end[:, :3, 3]).rmse
    merged_end_al = evaluation.ate(est[:, :3, 3], gt_end[:, :3, 3], align=True).rmse
    odom_end_al = evaluation.ate(odo[:, :3, 3], gt_end[:, :3, 3], align=True).rmse
    print(f"  END ate: merged={merged_end:.3f} odom={odom_end:.3f}; "
          f"END+aligned: merged={merged_end_al:.3f} odom={odom_end_al:.3f}")
    return merged, odom, wall


def main():
    which = sys.argv[1:] or ["default", "stride1"]
    for name in which:
        if name == "default":
            cfg = small_cfg()
        elif name == "stride1":
            cfg = small_cfg(dedup_stride=1)
        elif name == "anchor1":
            cfg = small_cfg(dedup_policy="anchor", dedup_stride=1)
        elif name == "anchor4":
            cfg = small_cfg(dedup_policy="anchor", dedup_stride=4)
        elif name == "stride_m1":
            cfg = dataclasses.replace(small_cfg(), mapping_stride=1)
        elif name in ("loc_gt", "loc_gt_static"):
            merged, odom, wall = run_loc_gt(
                small_cfg(), warped=(name == "loc_gt"))
            print(f"{name:10s}  mapped_ate={merged:.3f}  odom_ate={odom:.3f}  "
                  f"wall={wall:.0f}s", flush=True)
            continue
        else:
            raise SystemExit(f"unknown variant {name}")
        merged, odom, wall = run(cfg)
        print(f"{name:10s}  mapped_ate={merged:.3f}  odom_ate={odom:.3f}  "
              f"wall={wall:.0f}s", flush=True)


if __name__ == "__main__":
    main()
