"""One-off experiment: where does the batched odometry solve spend time?

Times three jitted programs on the bench problem at batch 64:
  (a) the 5 correspondence refreshes alone,
  (b) the 25 GN iterations alone (correspondences frozen),
  (c) the full solve,
so (c) - (a) - (b) exposes fusion/overlap effects.
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
from cooper_mapper_tpu.ops import gauss_newton as gn

from bench import build_problem, snug


def timeit(fn, args_fn, reps=4):
    jax.block_until_ready(fn(*args_fn()))
    dts = []
    for _ in range(reps):
        a = args_fn()
        t0 = time.perf_counter()
        jax.device_get(fn(*a))
        dts.append(time.perf_counter() - t0)
    return min(dts)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    cfg = OdometryConfig(nn_precision="high")
    f_prev, f_cur = build_problem()
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t
    )
    sharp, flat = tile(snug(f_cur.sharp)), tile(snug(f_cur.flat))
    ref_c, ref_s = tile(snug(f_prev.less_sharp)), tile(snug(f_prev.less_flat))
    rng = np.random.RandomState(0)
    x0f = lambda: jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)

    # (a) refreshes only (serialized so XLA cannot collapse them)
    @jax.jit
    def refreshes_b(x0):
        def one(x, sh, fl, rc, rs):
            out = 0.0
            for _ in range(5):
                corr = odo_ops._find_correspondences(x, sh, fl, rc, rs, cfg)
                out = out + jnp.sum(corr.A_c) + jnp.sum(corr.A_s)
                x = x + 1e-6 * out
            return out
        return jax.vmap(one)(x0, sharp, flat, ref_c, ref_s)

    dt_a = timeit(refreshes_b, lambda: (x0f(),))
    print(f"(a) 5 refreshes:        {dt_a*1e3:8.1f} ms", flush=True)

    # (b) one refresh + all 25 iterations on the frozen set
    cfg1 = OdometryConfig(refresh_every=25, nn_precision="high")

    @jax.jit
    def iters_only(x0):
        fn = lambda a, b, c, d, x: odo_ops.odometry_solve(a, b, c, d, x, cfg1)[0]
        return jax.vmap(fn)(sharp, flat, ref_c, ref_s, x0)

    dt_b = timeit(iters_only, lambda: (x0f(),))
    print(f"(b) 1 refresh + 25 it:  {dt_b*1e3:8.1f} ms", flush=True)

    solve = jax.jit(
        lambda a, b, c, d, x: odo_ops.batch_odometry_solve(a, b, c, d, x, cfg)[0]
    )
    dt_c = timeit(solve, lambda: (sharp, flat, ref_c, ref_s, x0f()))
    print(f"(c) full solve:         {dt_c*1e3:8.1f} ms  "
          f"({batch/dt_c:.1f} solves/s)", flush=True)
    per_refresh = dt_a / 5
    print(f"    => per refresh ~{per_refresh*1e3:.1f} ms; "
          f"25 iters ~{(dt_b - per_refresh)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
