"""Micro-profile of the pose-graph LM at n=1024 (VERDICT r2 task 5).

Times each stage of one LM iteration separately (jitted, steady-state):
  blocks   : per-edge residual+Jacobian blocks (_edge_blocks)
  precond  : damping + block-Jacobi inverse
  pcg      : 64-iteration PCG given fixed blocks
  cost     : one cost evaluation
  lm_iter  : one full LM iteration (optimize with max_iterations=1)

Usage: [env] python benchmarks/exp_pg_profile.py [n]
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


def timeit(fn, *args, reps=5, vary=None):
    """vary: callable(rep) -> replacement for args[0] — the axon relay
    caches executions on identical input buffers (CLAUDE.md), so every
    measured call must differ in at least one input."""
    out = fn(*args); jax.device_get(jax.tree.leaves(out)[0])
    ts = []
    for r in range(reps):
        a = (vary(r),) + args[1:] if vary is not None else args
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(fn(*a))[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    graph = build_graph(n)
    lam = jnp.float32(1e-4)
    rng = np.random.RandomState(7)

    def jitter_graph(r):
        return dataclasses.replace(
            graph,
            poses=graph.poses.at[:, 0, 3].add(
                jnp.asarray(1e-5 * rng.randn(n), jnp.float32)),
        )

    blocks_fn = jax.jit(pg._edge_blocks)
    t_blocks, blocks = timeit(blocks_fn, graph, vary=jitter_graph)
    H_ii, H_jj, H_ij, g, cost = blocks

    prec_fn = jax.jit(lambda gr, bi, bj: pg._damping_terms(gr, bi, bj, lam))
    t_prec, (damp, M) = timeit(prec_fn, graph, H_ii, H_jj, vary=jitter_graph)

    def jitter_blocks(r):
        return H_ii + jnp.float32(1e-7 * rng.randn())

    pcg_fn = jax.jit(lambda *a: pg._pcg_solve(*a, iters=64))
    t_pcg, dx = timeit(pcg_fn, H_ii, H_jj, H_ij, graph.edge_i, graph.edge_j,
                       damp, M, g, vary=jitter_blocks)

    cost_fn = jax.jit(pg._cost)
    t_cost, _ = timeit(cost_fn, graph, vary=jitter_graph)

    cfg1 = PoseGraphConfig(max_nodes=n, max_edges=2 * n, max_iterations=1,
                           solver="cg", pcg_iters=64)
    lm_fn = lambda gr: pg.optimize(gr, cfg1)[0].poses
    t_lm, _ = timeit(lm_fn, graph, vary=jitter_graph)

    cfg1d = dataclasses.replace(cfg1, solver="dense")
    lmd_fn = lambda gr: pg.optimize(gr, cfg1d)[0].poses
    t_lmd, _ = timeit(lmd_fn, graph, vary=jitter_graph)

    print(f"n={n} backend={jax.default_backend()}")
    for k, v in [("blocks", t_blocks), ("precond", t_prec), ("pcg64", t_pcg),
                 ("cost", t_cost), ("lm_iter_cg", t_lm),
                 ("lm_iter_dense", t_lmd)]:
        print(f"  {k:14s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
