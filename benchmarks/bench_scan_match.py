"""Scan-to-map solve throughput (the ~1 Hz LaserMapping path).

The reference runs one ScanMatch::scanMatchScan per mapping frame (~1 Hz
effective on the Jetson TX2, L_SLAM/README.md step 3).  This bench builds a
surround-map-sized reference cloud pair from the simulator and measures
batched scan-to-map GN solves/s (10-iteration budget, 5-NN PCA line / LSQ
plane fits, score gating — ScanMatch.cpp:51-347).

Usage: python benchmarks/bench_scan_match.py [batch]
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
    MatcherConfig, RegistrationConfig, ScanMatchConfig,
)
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.models import laser_mapping
from cooper_mapper_tpu.ops import features, scan_match as sm
from cooper_mapper_tpu.utils import cloud as cloud_lib


def build_problem(width=1024, n_rings=16, n_map_sweeps=6,
                  ref_corner_cap=8192, ref_surf_cap=16384):
    """Frame = voxel-downsampled less-sharp/less-flat stacks — what the
    mapping pipeline actually solves with (prepareFeatureFrame,
    LaserMatcher.cpp:288-301).  The map side is an AGGREGATE of several
    sweeps from nearby poses, voxel-downsampled at the map leaves — a
    single sweep's ring structure leaves 5-NN neighborhoods collinear, so
    findPlane rejects nearly everything and the score gate can never pass
    (the reference's surround is likewise a multi-sweep accumulation,
    FeatureMap.h:256-265)."""
    from cooper_mapper_tpu.ops.voxel import voxel_downsample
    from cooper_mapper_tpu.utils import se3

    world = sim.make_room_world(seed=7)
    p0 = jnp.eye(4, dtype=jnp.float32).at[1, 3].set(1.5)
    th = 0.02
    motion = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th), 0.1], [0, 1, 0, 0],
         [-np.sin(th), 0, np.cos(th), 0.3], [0, 0, 0, 1]], np.float32))
    p1 = p0 @ motion
    cfg_reg = RegistrationConfig(n_rings=n_rings, max_points_per_ring=width)

    # accumulate a small world-frame map from poses around the start
    rng = np.random.RandomState(3)
    ref_c_parts, ref_s_parts = [], []
    for k in range(n_map_sweeps):
        pk = np.asarray(p0).copy()
        pk[:3, 3] += np.array([rng.uniform(-1.5, 1.5), rng.uniform(-0.2, 0.2),
                               rng.uniform(-1.5, 1.5)], np.float32)
        yaw = rng.uniform(-0.4, 0.4)
        c, s = np.cos(yaw), np.sin(yaw)
        pk = pk @ np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0],
                            [0, 0, 0, 1]], np.float32)
        pk = jnp.asarray(pk)
        fk = features.extract_features(
            sim.scan_sweep(world, pk, pk, n_rings=n_rings, width=width),
            cfg_reg)
        ref_c_parts.append(laser_mapping._to_world(fk.less_sharp, pk))
        ref_s_parts.append(laser_mapping._to_world(fk.less_flat, pk))

    cat = lambda parts: cloud_lib.make(
        jnp.concatenate([p.xyz for p in parts]),
        jnp.concatenate([p.mask for p in parts]))
    ref_c = voxel_downsample(cat(ref_c_parts), 0.2, ref_corner_cap)
    ref_s = voxel_downsample(cat(ref_s_parts), 0.4, ref_surf_cap)

    f_cur = features.extract_features(
        sim.scan_sweep(world, p0, p1, n_rings=n_rings, width=width), cfg_reg)
    corner_ds, surf_ds = laser_mapping.prepare_frame(
        f_cur.less_sharp, f_cur.less_flat,
        MatcherConfig(max_frame_corner=2048, max_frame_surf=4096),
    )
    # snug static capacities to the valid counts (bench.py "snug": the
    # extractor bounds are sensor-generic, 2-10x the valid counts here, and
    # dense-race work scales with capacity product, not valid points).
    # BENCH_REF_GRAN overrides the REFERENCE clouds' snug granule: the
    # streaming top-k kernel needs M % tile_m == 0, so a 256-granule M
    # (5888) silently caps tile_m at 256 — padding the reference to a
    # 2048-multiple (6144) buys the big reference tiles at ~4% extra race
    # work (round-4 tile A/B)
    from bench import snug
    ref_gran = int(os.environ.get("BENCH_REF_GRAN", "256"))
    return (snug(corner_ds), snug(surf_ds),
            snug(ref_c, ref_gran), snug(ref_s, ref_gran))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = ScanMatchConfig()
    corner, surf, ref_c, ref_s = build_problem()
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t)
    rng = np.random.RandomState(0)

    solve = jax.jit(lambda a, b, c, d, x: sm.batch_scan_match(a, b, c, d, x, cfg))
    # BENCH_SHARED_REF=0 restores the per-problem broadcast reference (the
    # round-4 shape whose throughput decayed with batch); the default shares
    # ONE reference across the batch — the aggregated-map workload's real
    # structure (batch_scan_match docstring)
    shared = os.environ.get("BENCH_SHARED_REF", "1") == "1"
    if shared:
        args = (tile(corner), tile(surf), ref_c, ref_s)
    else:
        args = (tile(corner), tile(surf), tile(ref_c), tile(ref_s))
    x0 = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
    out = solve(*args, x0)
    jax.block_until_ready(out.x)

    # best-of-reps, one rep per timed span (bench.py convention): the relay
    # time-slices the chip between tenants, so a mean over a multi-second
    # span measures congestion, and longer batches absorb more preemption —
    # the round-3 "b256 regression" was partly this measurement artifact
    reps = 5
    trace_dir = os.environ.get("COOPER_XLA_TRACE", "")
    dts = []
    for r in range(reps):
        x0r = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
        if trace_dir and r == 2:
            with jax.profiler.trace(trace_dir):
                t0 = time.perf_counter()
                jax.device_get(solve(*args, x0r).x)
                dts.append(time.perf_counter() - t0)
            continue
        t0 = time.perf_counter()
        jax.device_get(solve(*args, x0r).x)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    print({
        "batch": batch,
        "shared_ref": shared,
        "scan_to_map_solves_per_s": round(batch / dt, 2),
        "wall_per_batch_ms": round(dt * 1e3, 1),
        "mean_ms": round(sum(dts) / reps * 1e3, 1),
        "vs_tx2_1hz_mapping": round(batch / dt / 1.0, 1),
    })


if __name__ == "__main__":
    main()
