"""One-off experiment: per-GN-iteration cost attribution at bench batch.

Times the 25-iteration inner solve (1 refresh) with three 6x6 linear-solver
variants to see if the batched LU (jnp.linalg.solve) is a bottleneck:
  lu    jnp.linalg.solve                     (current)
  chol  jax.scipy cho_factor/cho_solve
  none  dx = Jtb (no solve — floor)
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
from cooper_mapper_tpu.ops import gauss_newton as gn
from cooper_mapper_tpu.ops import odometry as odo_ops

from bench import build_problem, snug


def main():
    B = int(os.environ.get("BENCH_BATCH", "512"))
    f_prev, f_cur = build_problem()
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), t
    )
    sharp, flat = tile(snug(f_cur.sharp)), tile(snug(f_cur.flat))
    ref_c, ref_s = tile(snug(f_prev.less_sharp)), tile(snug(f_prev.less_flat))
    rng = np.random.RandomState(0)
    cfg = OdometryConfig(refresh_every=25)

    orig_solve = gn.solve_6x6

    def chol_solve(JtJ, Jtb, damping=0.0):
        A = JtJ + 1e-12 * jnp.eye(6, dtype=JtJ.dtype)
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, Jtb[..., None], lower=True)
        return jax.scipy.linalg.solve_triangular(
            L, y, lower=True, trans=1)[..., 0]

    def no_solve(JtJ, Jtb, damping=0.0):
        return 1e-3 * Jtb

    for name, fn in (("lu", orig_solve), ("chol", chol_solve), ("none", no_solve)):
        gn.solve_6x6 = fn
        solve = jax.jit(
            lambda a, b, c, d, x: odo_ops.batch_odometry_solve(a, b, c, d, x, cfg)[0]
        )
        x0 = jnp.asarray(0.02 * rng.randn(B, 6), jnp.float32)
        jax.block_until_ready(solve(sharp, flat, ref_c, ref_s, x0))
        dts = []
        for _ in range(4):
            x0r = jnp.asarray(0.02 * rng.randn(B, 6), jnp.float32)
            t0 = time.perf_counter()
            jax.device_get(solve(sharp, flat, ref_c, ref_s, x0r))
            dts.append(time.perf_counter() - t0)
        print(f"{name:5s}: {min(dts)*1e3:8.1f} ms (1 refresh + 25 iters)",
              flush=True)
    gn.solve_6x6 = orig_solve


if __name__ == "__main__":
    main()
