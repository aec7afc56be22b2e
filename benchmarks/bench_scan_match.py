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
from cooper_mapper_tpu.config import RegistrationConfig, ScanMatchConfig
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.ops import features, scan_match as sm
from cooper_mapper_tpu.utils import cloud as cloud_lib


def build_problem(width=1024, n_rings=16):
    world = sim.make_room_world(seed=7)
    p0 = jnp.eye(4, dtype=jnp.float32).at[1, 3].set(1.5)
    th = 0.02
    motion = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th), 0.1], [0, 1, 0, 0],
         [-np.sin(th), 0, np.cos(th), 0.3], [0, 0, 0, 1]], np.float32))
    p1 = p0 @ motion
    cfg_reg = RegistrationConfig(n_rings=n_rings, max_points_per_ring=width)
    f_ref = features.extract_features(
        sim.scan_sweep(world, p0, p0, n_rings=n_rings, width=width), cfg_reg)
    f_cur = features.extract_features(
        sim.scan_sweep(world, p0, p1, n_rings=n_rings, width=width), cfg_reg)
    # the map side is the aggregated less-sharp/less-flat reference clouds
    return f_cur.sharp, f_cur.flat, f_ref.less_sharp, f_ref.less_flat


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = ScanMatchConfig()
    corner, surf, ref_c, ref_s = build_problem()
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t)
    rng = np.random.RandomState(0)

    solve = jax.jit(lambda a, b, c, d, x: sm.batch_scan_match(a, b, c, d, x, cfg))
    args = (tile(corner), tile(surf), tile(ref_c), tile(ref_s))
    x0 = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
    out = solve(*args, x0)
    jax.block_until_ready(out.x)

    reps = 5
    x0s = [jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
           for _ in range(reps)]
    t0 = time.perf_counter()
    outs = [solve(*args, x) for x in x0s]
    jax.device_get([o.x for o in outs])
    dt = (time.perf_counter() - t0) / reps

    print({
        "batch": batch,
        "scan_to_map_solves_per_s": round(batch / dt, 2),
        "wall_per_batch_ms": round(dt * 1e3, 1),
        "vs_tx2_1hz_mapping": round(batch / dt / 1.0, 1),
    })


if __name__ == "__main__":
    main()
