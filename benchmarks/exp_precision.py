"""One-off experiment: bench sensitivity to batch size and NN matmul precision.

Not part of the benchmark suite — drives bench.py's problem through the
batched odometry solve at several (batch, precision) points to pick the
operating point for the headline bench.
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

from bench import build_problem


def run(batch, cfg, reps=4):
    f_prev, f_cur = build_problem()
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t
    )
    sharp, flat = tile(f_cur.sharp), tile(f_cur.flat)
    ref_c, ref_s = tile(f_prev.less_sharp), tile(f_prev.less_flat)
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
    for batch in (64, 128, 256):
        for prec in ("highest", "high", "default"):
            cfg = OdometryConfig(nn_precision=prec)
            try:
                sps = run(batch, cfg)
                print(f"batch={batch:4d} prec={prec:8s} -> {sps:9.1f} solves/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"batch={batch:4d} prec={prec:8s} -> FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
