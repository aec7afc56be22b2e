"""On-chip bisect probe for the scan-to-map TPU kernel fault (VERDICT r2 #2).

Each stage runs in its own process (a faulted TPU context can poison
subsequent launches).  Usage: python benchmarks/probe_scan_match.py STAGE
  dense_b64       batch 64, dense 5-NN (use_bucket_grid=False)
  bucket_b8       batch 8, bucket grid defaults
  bucket_b64      batch 64, bucket grid defaults (the crashing config)
  bucket_b64_h13  batch 64, hash_bits=13 (1/16th slot memory)
  build_b64       batch 64, bucket build only
  query_b64       batch 64, build + one query, no solve
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
from cooper_mapper_tpu.config import ScanMatchConfig
from cooper_mapper_tpu.ops import bucket_knn, scan_match as sm
from bench_scan_match import build_problem


def main():
    stage = sys.argv[1]
    corner, surf, ref_c, ref_s = build_problem()
    rng = np.random.RandomState(0)

    def solve_stage(batch, cfg):
        tile = lambda t: jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t)
        args = (tile(corner), tile(surf), tile(ref_c), tile(ref_s))
        x0 = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
        solve = jax.jit(lambda a, b, c, d, x: sm.batch_scan_match(a, b, c, d, x, cfg))
        t0 = time.perf_counter()
        out = solve(*args, x0)
        jax.device_get(out.x)
        print(f"{stage}: OK first-call {time.perf_counter()-t0:.1f}s "
              f"success={int(jnp.sum(out.success))}/{batch}", flush=True)
        x1 = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
        t0 = time.perf_counter()
        jax.device_get(solve(*args, x1).x)
        dt = time.perf_counter() - t0
        print(f"{stage}: steady {dt*1e3:.0f} ms -> {batch/dt:.1f} solves/s",
              flush=True)

    if stage == "dense_b64":
        solve_stage(64, ScanMatchConfig(use_bucket_grid=False))
    elif stage == "bucket_b8":
        solve_stage(8, ScanMatchConfig())
    elif stage == "bucket_b64":
        solve_stage(64, ScanMatchConfig())
    elif stage == "bucket_b64_h13":
        solve_stage(64, ScanMatchConfig(bucket_hash_bits=13))
    elif stage in ("build_b64", "query_b64"):
        cfg = ScanMatchConfig()
        batch = 64
        tile = lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape)
        rc_xyz, rc_mask = tile(ref_s.xyz), tile(ref_s.mask)
        build = jax.jit(jax.vmap(lambda x, m: bucket_knn.build(
            x, m, cfg.bucket_cell, cfg.bucket_hash_bits, cfg.bucket_capacity)))
        g = build(rc_xyz, rc_mask)
        jax.block_until_ready(g.slots)
        print(f"{stage}: build OK slots {g.slots.shape}", flush=True)
        if stage == "query_b64":
            q = tile(surf.xyz)
            qf = jax.jit(jax.vmap(lambda gs, rx, rm, qx: bucket_knn.query(
                dataclasses.replace(g, slots=gs), rx, rm, qx, cfg.knn)))
            idx, d = qf(g.slots, rc_xyz, rc_mask, q)
            jax.device_get(d)
            print(f"{stage}: query OK d shape {d.shape}", flush=True)
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
