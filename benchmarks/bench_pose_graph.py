"""Pose-graph LM throughput: iterations/s on device (BASELINE metric #2).

The reference's backend is g2o lm_var with CSparse, budgeted at <=1000 LM
iterations per optimize() with wall time printed per run
(solver_g2o.cpp:79-95).  This bench builds a drifted loop-closure graph at a
configurable node count and measures full LM iterations/s for both inner
solvers (dense Cholesky vs matrix-free block-Jacobi PCG).

Usage: python benchmarks/bench_pose_graph.py [n_nodes] [solver] [lm_iters] [pcg_iters]

``lm_iters`` defaults to 20; the reference budgets up to 1000 LM iterations
per optimize (solver_g2o.cpp:79-95), so a larger-budget point additionally
amortizes the ~0.5 s per-dispatch relay overhead out of the iters/s figure.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import PoseGraphConfig
from cooper_mapper_tpu.ops import pose_graph as pg


def build_graph(n, seed=0, loop_every=100):
    """Drifted loop-closure graph, assembled host-side in numpy (a Python
    add_node/add_edge loop costs one device round trip per element — minutes
    through the axon tunnel at n=1024)."""
    rng = np.random.RandomState(seed)
    gt = [np.eye(4, dtype=np.float32)]
    step = np.eye(4, dtype=np.float32)
    step[0, 3] = 1.0
    th = 2 * np.pi / n
    rot = np.array(
        [[np.cos(th), 0, np.sin(th), 0], [0, 1, 0, 0],
         [-np.sin(th), 0, np.cos(th), 0], [0, 0, 0, 1]], np.float32)
    for k in range(1, n):
        gt.append(gt[-1] @ step @ rot)
    est = [gt[0]]
    ei, ej, eT, einfo = [], [], [], []
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.eye(4, dtype=np.float32)
        noise[:3, 3] = 0.02 * rng.randn(3)
        rel_noisy = (rel @ noise).astype(np.float32)
        est.append((est[-1] @ rel_noisy).astype(np.float32))
        ei.append(k - 1); ej.append(k); eT.append(rel_noisy)
        einfo.append(np.ones(6, np.float32))
    for k in range(loop_every, n, loop_every):
        rel = (np.linalg.inv(gt[k - loop_every]) @ gt[k]).astype(np.float32)
        ei.append(k - loop_every); ej.append(k); eT.append(rel)
        einfo.append(2.0 * np.ones(6, np.float32))
    return pg.from_arrays(np.stack(est), ei, ej, np.stack(eT),
                          np.stack(einfo), max_nodes=n, max_edges=2 * n)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    solver = sys.argv[2] if len(sys.argv) > 2 else "cg"
    solver = {"pcg": "cg"}.get(solver, solver)  # alias
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    pcg_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    cfg = PoseGraphConfig(max_nodes=n, max_edges=2 * n, max_iterations=iters,
                          solver=solver, pcg_iters=pcg_iters)
    graph = build_graph(n)

    out, diag = pg.optimize(graph, cfg)  # compile + warmup
    jax.block_until_ready(out.poses)

    reps = 5
    # vary the start point per rep (execution-cache guard) by jittering poses;
    # time each rep INDIVIDUALLY and take the best — the relay time-slices the
    # chip between tenants, so any single dispatch can sit in a server-side
    # queue for seconds; the mean measures congestion, the best rep measures
    # the device (same policy as bench.py; battery r3's first pose-graph
    # capture averaged co-dispatched reps and read 0.14 iters/s for a path
    # whose best-of slope is 388 iters/s, exp_pg_slope)
    rng = np.random.RandomState(1)
    dts = []
    for _ in range(reps):
        g = dataclasses.replace(
            graph,
            poses=graph.poses.at[:, 0, 3].add(
                jnp.asarray(1e-4 * rng.randn(n), jnp.float32)
            ),
        )
        t0 = time.perf_counter()
        jax.device_get(pg.optimize(g, cfg)[0].poses)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    print({
        "nodes": n, "edges": int(np.asarray(jnp.sum(graph.edge_mask))),
        "solver": solver,
        "lm_iters_per_s": round(iters / dt, 2),
        "cost": f"{float(diag['initial_cost']):.4f} -> {float(diag['final_cost']):.4f}",
        "wall_per_optimize_ms": round(dt * 1e3, 1),
    })


if __name__ == "__main__":
    main()
