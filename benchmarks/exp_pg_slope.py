"""Per-LM-iteration cost via the iteration-count slope (relay-overhead-proof).

Times pg.optimize at max_iterations in {1, 3, 10, 20} (same graph, poses
jittered per rep to defeat the relay execution cache) and reports the fitted
slope = true device cost per LM iteration, intercept = dispatch overhead.

Usage: python benchmarks/exp_pg_slope.py [n] [solver]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import PoseGraphConfig
from cooper_mapper_tpu.ops import pose_graph as pg
from bench_pose_graph import build_graph


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    solver = sys.argv[2] if len(sys.argv) > 2 else "cg"
    graph = build_graph(n)
    rng = np.random.RandomState(7)

    iter_counts = [1, 3, 10, 20]
    walls = []
    for iters in iter_counts:
        cfg = PoseGraphConfig(max_nodes=n, max_edges=2 * n,
                              max_iterations=iters, solver=solver,
                              pcg_iters=64)
        fn = lambda gr: pg.optimize(gr, cfg)[0].poses
        jax.device_get(fn(graph))  # compile
        ts = []
        for _ in range(3):
            g = dataclasses.replace(
                graph,
                poses=graph.poses.at[:, 0, 3].add(
                    jnp.asarray(1e-5 * rng.randn(n), jnp.float32)),
            )
            t0 = time.perf_counter()
            jax.device_get(fn(g))
            ts.append(time.perf_counter() - t0)
        walls.append(min(ts) * 1e3)
        print(f"iters={iters:3d}  wall={walls[-1]:8.1f} ms", flush=True)

    A = np.stack([np.array(iter_counts, float), np.ones(len(iter_counts))], 1)
    slope, intercept = np.linalg.lstsq(A, np.array(walls), rcond=None)[0]
    print(f"n={n} solver={solver}: {slope:.1f} ms/LM-iter "
          f"(+{intercept:.1f} ms dispatch) -> {1e3/slope:.1f} iters/s")


if __name__ == "__main__":
    main()
