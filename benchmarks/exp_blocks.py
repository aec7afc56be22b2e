"""One-off experiment: full-solve time vs number of refresh blocks.

The full solve (5 blocks) costs ~2.5x the sum of its measured parts; this
sweeps refresh_every in {25, 13, 9, 5} (1/2/3/5 blocks, same 25 iterations)
to expose any per-block overhead in the unrolled outer structure.
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

from bench import build_problem, snug


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    f_prev, f_cur = build_problem()
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t
    )
    sharp, flat = tile(snug(f_cur.sharp)), tile(snug(f_cur.flat))
    ref_c, ref_s = tile(snug(f_prev.less_sharp)), tile(snug(f_prev.less_flat))
    rng = np.random.RandomState(0)

    for re in (25, 13, 9, 5):
        cfg = OdometryConfig(nn_precision="high", refresh_every=re)
        solve = jax.jit(
            lambda a, b, c, d, x, cfg=cfg: odo_ops.batch_odometry_solve(
                a, b, c, d, x, cfg)[0]
        )
        x0 = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
        jax.block_until_ready(solve(sharp, flat, ref_c, ref_s, x0))
        dts = []
        for _ in range(4):
            x0r = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
            t0 = time.perf_counter()
            jax.device_get(solve(sharp, flat, ref_c, ref_s, x0r))
            dts.append(time.perf_counter() - t0)
        n_blocks = -(-25 // re)
        print(f"refresh_every={re:2d} ({n_blocks} blocks) -> "
              f"{min(dts)*1e3:8.1f} ms  ({batch/min(dts):7.1f} solves/s)",
              flush=True)


if __name__ == "__main__":
    main()
