"""One-off experiment: right-sized (compacted) cloud capacities in the bench.

The extractor's static capacities are sensor-generic upper bounds (2-12x the
valid point count on the bench world).  Compacting to snug multiples of 256
is the fixed-shape equivalent of the reference's exactly-sized dynamic
clouds; this measures the speedup at several batch sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import OdometryConfig
from cooper_mapper_tpu.ops import odometry as odo_ops
from cooper_mapper_tpu.utils import cloud as cloud_lib

from bench import build_problem


def snug(c):
    n = int(jnp.sum(c.mask))
    cap = -(-n // 256) * 256
    return cloud_lib.compact(c, cap)


def run(batch, cfg, clouds, reps=4):
    sharp, flat, ref_c, ref_s = clouds
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t
    )
    sharp, flat, ref_c, ref_s = tile(sharp), tile(flat), tile(ref_c), tile(ref_s)
    rng = np.random.RandomState(0)
    solve = jax.jit(
        lambda a, b, c, d, x: odo_ops.batch_odometry_solve(a, b, c, d, x, cfg)[0]
    )
    x0 = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
    jax.block_until_ready(solve(sharp, flat, ref_c, ref_s, x0))
    dts = []
    for _ in range(reps):
        x0r = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
        t0 = time.perf_counter()
        jax.device_get(solve(sharp, flat, ref_c, ref_s, x0r))
        dts.append(time.perf_counter() - t0)
    return batch / min(dts)


def main():
    f_prev, f_cur = build_problem()
    full = (f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat)
    tight = tuple(snug(c) for c in full)
    print("capacities:", [c.capacity for c in tight], flush=True)
    for batch in (64, 256, 512):
        for prec in ("highest", "high"):
            cfg = OdometryConfig(nn_precision=None if prec == "highest" else prec)
            sps = run(batch, cfg, tight)
            print(f"compact batch={batch:4d} prec={prec:8s} -> {sps:9.1f} solves/s",
                  flush=True)


if __name__ == "__main__":
    main()
