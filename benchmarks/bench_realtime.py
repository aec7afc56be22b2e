"""Single-stream real-time budget: on-device per-sweep latency of the fused
SLAM steps vs LOAM's 100 ms odometry / 1000 ms mapping budgets.

The reference runs 10 Hz odometry / 1 Hz mapping per stream on a Jetson TX2
(L_SLAM/README.md; BASELINE.md "Real-time budget").  The SlamPipeline demo
numbers are relay-dominated (one dispatch per stage, pose transfers
between); this bench measures the fused one-dispatch steps
(models/fused.py) the way a latency-sensitive deployment would run them:
state donated on device, per-sweep input varied (the relay caches identical
executions), completion forced with device_get of the returned pose.

Usage: python benchmarks/bench_realtime.py [n_sweeps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu import config as cfg_mod
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.models import fused


def build_sweeps(n, width=1024, n_rings=16):
    """A straight drive at VLP-16 scale (16 x 1024), one sweep per 0.35 m."""
    world = sim.make_room_world(size=(30.0, 4.0, 60.0), n_pillars=10, seed=9)
    p = np.eye(4, dtype=np.float32)
    p[1, 3] = 1.5
    step = np.eye(4, dtype=np.float32)
    step[2, 3] = 0.35
    sweeps = []
    for _ in range(n):
        p2 = p @ step
        sweeps.append(sim.scan_sweep(world, jnp.asarray(p), jnp.asarray(p2),
                                     n_rings=n_rings, width=width))
        p = p2
    return sweeps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    cfg = cfg_mod.PipelineConfig()
    sweeps = build_sweeps(n)

    st = fused.create(cfg)
    st = fused.init_sweep(st, sweeps[0], cfg)
    # warmup/compile both step kinds
    st, W, _ = fused.odometry_sweep(st, sweeps[1], cfg)
    jax.device_get(W)
    st, W, _ = fused.mapping_sweep(st, sweeps[2], cfg)
    jax.device_get(W)

    odo_ms, map_ms = [], []
    for i, sw in enumerate(sweeps[3:], 3):
        is_map = (i % 2) == 0
        t0 = time.perf_counter()
        if is_map:
            st, W, ok = fused.mapping_sweep(st, sw, cfg)
        else:
            st, W, nm = fused.odometry_sweep(st, sw, cfg)
        jax.device_get(W)
        dt = (time.perf_counter() - t0) * 1e3
        (map_ms if is_map else odo_ms).append(dt)

    res = {
        "sweeps": n,
        "odometry_ms_per_sweep_best": round(min(odo_ms), 1),
        "odometry_ms_per_sweep_median": round(sorted(odo_ms)[len(odo_ms) // 2], 1),
        "mapping_ms_per_sweep_best": round(min(map_ms), 1),
        "mapping_ms_per_sweep_median": round(sorted(map_ms)[len(map_ms) // 2], 1),
        "loam_budget_ms": {"odometry": 100, "mapping": 1000},
        "meets_budget": bool(min(odo_ms) < 100 and min(map_ms) < 1000),
    }
    print(res)


if __name__ == "__main__":
    main()
