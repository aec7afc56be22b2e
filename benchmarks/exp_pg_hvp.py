"""One-off experiment: scatter-add vs sorted-cumsum HVP for the PCG solver.

The block-Jacobi PCG path (ops/pose_graph._pcg_solve) applies the Hessian via
two `.at[].add` edge scatters per CG step; TPU lowers scatter-add to a
serialized loop, so 64 CG steps x 2 scatters could dominate the measured
6.1 ms/LM-iteration at n=1024.  The alternative: sort edge contributions by
destination node ONCE per optimize, then each HVP is gather + cumsum + two
boundary gathers (all dense vector ops).  This times both formulations in
isolation on the bench graph.

Usage: python benchmarks/exp_pg_hvp.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.ops import pose_graph as pg
from bench_pose_graph import build_graph


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    graph = build_graph(n)
    H_ii, H_jj, H_ij, g, _ = jax.jit(pg._edge_blocks)(graph)
    damp, M = jax.jit(pg._damping_terms)(graph, H_ii, H_jj, jnp.float32(1e-4))

    E = graph.edge_i.shape[0]
    reps = 64  # one LM iteration's worth of CG steps

    @jax.jit
    def hvp_scatter_chain(v):
        def body(k, v):
            out = pg._hvp(H_ii, H_jj, H_ij, graph.edge_i, graph.edge_j, damp, v)
            return out / jnp.maximum(jnp.linalg.norm(out), 1e-20)
        return jax.lax.fori_loop(0, reps, body, v)

    # sorted-cumsum formulation: dest ids [2E] = concat(edge_i, edge_j)
    dest = jnp.concatenate([graph.edge_i, graph.edge_j])
    order = jnp.argsort(dest)
    dest_sorted = dest[order]
    # start offset of each node's segment in the sorted array
    starts = jnp.searchsorted(dest_sorted, jnp.arange(n), side="left")
    ends = jnp.searchsorted(dest_sorted, jnp.arange(n), side="right")

    @jax.jit
    def hvp_cumsum_chain(v):
        def one(v):
            vi = v[graph.edge_i]
            vj = v[graph.edge_j]
            ci = jnp.einsum("epq,eq->ep", H_ii, vi) + jnp.einsum(
                "epq,eq->ep", H_ij, vj)
            cj = jnp.einsum("eqp,eq->ep", H_ij, vi) + jnp.einsum(
                "epq,eq->ep", H_jj, vj)
            contrib = jnp.concatenate([ci, cj])[order]          # [2E, 6]
            c = jnp.cumsum(contrib, axis=0)
            c = jnp.concatenate([jnp.zeros((1, 6), c.dtype), c])
            out = c[ends] - c[starts]
            return out + damp * v

        def body(k, v):
            out = one(v)
            return out / jnp.maximum(jnp.linalg.norm(out), 1e-20)
        return jax.lax.fori_loop(0, reps, body, v)

    # degree-capped gather: per-node list of incident (contribution) slots in
    # the concat(ci, cj) array, padded to the max degree (host-side build —
    # the graph's edge lists are static per optimize)
    dest_h = np.asarray(dest)
    active = np.concatenate([np.asarray(graph.edge_mask)] * 2)
    # masked-out slots contribute exact zeros (their H blocks are zeroed at
    # assembly), so the adjacency only lists ACTIVE contribution slots
    Dmax = int(np.bincount(dest_h[active], minlength=n).max())
    adj = np.full((n, Dmax), 2 * E, np.int32)       # 2E = padding slot
    fill = np.zeros(n, np.int32)
    for slot, node in enumerate(dest_h):
        if active[slot]:
            adj[node, fill[node]] = slot
            fill[node] += 1
    adj_j = jnp.asarray(adj)

    @jax.jit
    def hvp_gather_chain(v):
        def one(v):
            vi = v[graph.edge_i]
            vj = v[graph.edge_j]
            ci = jnp.einsum("epq,eq->ep", H_ii, vi) + jnp.einsum(
                "epq,eq->ep", H_ij, vj)
            cj = jnp.einsum("eqp,eq->ep", H_ij, vi) + jnp.einsum(
                "epq,eq->ep", H_jj, vj)
            contrib = jnp.concatenate(
                [ci, cj, jnp.zeros((1, 6), ci.dtype)])  # [2E+1, 6]
            out = jnp.sum(contrib[adj_j], axis=1)       # [N, D, 6] -> [N, 6]
            return out + damp * v

        def body(k, v):
            out = one(v)
            return out / jnp.maximum(jnp.linalg.norm(out), 1e-20)
        return jax.lax.fori_loop(0, reps, body, v)

    v0 = jnp.asarray(np.random.RandomState(0).randn(n, 6), jnp.float32)
    a = jax.device_get(hvp_scatter_chain(v0))
    b = jax.device_get(hvp_cumsum_chain(v0))
    c = jax.device_get(hvp_gather_chain(v0))
    print(f"n={n} E={E} Dmax={Dmax} chain of {reps} HVPs: "
          f"max|scatter-cumsum|={np.abs(a-b).max():.2e} "
          f"max|scatter-gather|={np.abs(a-c).max():.2e}", flush=True)

    rng = np.random.RandomState(1)
    for name, fn in (("scatter", hvp_scatter_chain),
                     ("cumsum", hvp_cumsum_chain),
                     ("gather", hvp_gather_chain)):
        dts = []
        for _ in range(4):
            v = jnp.asarray(rng.randn(n, 6), jnp.float32)
            t0 = time.perf_counter()
            jax.device_get(fn(v))
            dts.append(time.perf_counter() - t0)
        print(f"{name:8s}: {min(dts)*1e3:8.2f} ms / {reps} HVPs "
              f"({min(dts)/reps*1e6:.0f} us each)", flush=True)


if __name__ == "__main__":
    main()
