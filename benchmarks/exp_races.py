"""One-off experiment: cost structure of the correspondence races.

The full solve spends ~90% of its time in the 5 correspondence refreshes.
This times, at bench batch size, isolated variants of the surf_triples /
corner_pairs races to find the cheapest formulation:

  r1   race 1 only (argmin over d)                  — lower bound, 1 pass
  full all three races as written                   — the current cost
  rem  d rematerialized per race (optimization_barrier blocks CSE)
  t    transposed tile [M, Q]: reductions over sublanes instead of lanes
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.ops import neighbors

from bench import build_problem, snug

BIG = 1.0e12


def timeit(fn, qs, reps=4):
    jax.block_until_ready(fn(qs[0]))
    dts = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(qs[1 + i]))
        dts.append(time.perf_counter() - t0)
    return min(dts) * 1e3


def main():
    B = int(os.environ.get("BENCH_BATCH", "512"))
    f_prev, f_cur = build_problem()
    flat = snug(f_cur.flat)
    ref = snug(f_prev.less_flat)
    Q, M = flat.capacity, ref.capacity
    print(f"B={B} Q={Q} M={M}", flush=True)

    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), t
    )
    refb = tile(ref)
    rng = np.random.RandomState(0)
    qs = [
        jnp.asarray(
            flat.xyz[None] + 0.001 * rng.randn(B, Q, 3), jnp.float32
        )
        for _ in range(6)
    ]

    def consume(*arrs):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)

    # --- race 1 only -------------------------------------------------------
    @jax.jit
    def r1(q):
        def one(qx, r):
            d = neighbors.pairwise_sq_dist(qx, r.xyz)
            d = jnp.where(r.mask[None, :], d, BIG)
            ia = jnp.argmin(d, -1)
            da = jnp.take_along_axis(d, ia[:, None], -1)[:, 0]
            return consume(ia, da)
        return jax.vmap(one)(q, refb)

    print(f"r1 (1 race):            {timeit(r1, qs):8.1f} ms", flush=True)

    # --- all three races, as written --------------------------------------
    @jax.jit
    def full(q):
        def one(qx, r):
            ia, ib, ic, ok = neighbors.surf_triples(qx, r, 25.0)
            return consume(ia, ib, ic, ok)
        return jax.vmap(one)(q, refb)

    print(f"full (3 races):         {timeit(full, qs):8.1f} ms", flush=True)

    # --- rematerialized d per race -----------------------------------------
    @jax.jit
    def rem(q):
        def one(qx, r):
            ds = []
            for _ in range(3):
                qb = jax.lax.optimization_barrier(qx)
                d = neighbors.pairwise_sq_dist(qb, r.xyz)
                ds.append(jnp.where(r.mask[None, :], d, BIG))
            ia = jnp.argmin(ds[0], -1)
            ring_a = r.ring[ia]
            same = r.ring[None, :] == ring_a[:, None]
            nota = jnp.arange(r.capacity)[None, :] != ia[:, None]
            ib = jnp.argmin(jnp.where(same & nota, ds[1], BIG), -1)
            diff = jnp.abs(r.ring[None, :] - ring_a[:, None])
            adj = (diff > 0) & (diff <= 2)
            ic = jnp.argmin(jnp.where(adj, ds[2], BIG), -1)
            return consume(ia, ib, ic)
        return jax.vmap(one)(q, refb)

    print(f"rem (remat d):          {timeit(rem, qs):8.1f} ms", flush=True)

    # --- transposed: reductions over the sublane axis ----------------------
    @jax.jit
    def transposed(q):
        def one(qx, r):
            dT = (
                jnp.sum(r.xyz * r.xyz, -1)[:, None]
                - 2.0 * r.xyz @ qx.T
                + jnp.sum(qx * qx, -1)[None, :]
            )                                           # [M, Q]
            dT = jnp.where(r.mask[:, None], dT, BIG)
            ia = jnp.argmin(dT, 0)
            ring_a = r.ring[ia]
            same = r.ring[:, None] == ring_a[None, :]
            nota = jnp.arange(r.capacity)[:, None] != ia[None, :]
            ib = jnp.argmin(jnp.where(same & nota, dT, BIG), 0)
            diff = jnp.abs(r.ring[:, None] - ring_a[None, :])
            adj = (diff > 0) & (diff <= 2)
            ic = jnp.argmin(jnp.where(adj, dT, BIG), 0)
            return consume(ia, ib, ic)
        return jax.vmap(one)(q, refb)

    print(f"t (transposed [M,Q]):   {timeit(transposed, qs):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
