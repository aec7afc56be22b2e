"""A/B the dense [6N, 6N] LM inner solve: LU (jnp.linalg.solve) vs Cholesky.

The battery r3 measured the dense pose-graph path at n=256 two orders of
magnitude slower than round 2 (142.8 s vs 0.41 s per 20-iteration optimize).
The damped normal-equation matrix is SPD by construction (gauge boost +
multiplicative LM damping, ops/pose_graph.py:_assemble), so a Cholesky
factorization is valid — and on TPU, LU with partial pivoting serializes on
row selection while Cholesky is blocked.  This probe times both inner solves
standalone, inside the same fori_loop structure optimize() uses.

Usage: python benchmarks/exp_dense_solve.py [n_nodes] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401


def make_spd(dim, seed):
    rng = np.random.RandomState(seed)
    A = rng.randn(dim, dim).astype(np.float32) / np.sqrt(dim)
    H = A @ A.T + 1e-2 * np.eye(dim, dtype=np.float32)
    g = rng.randn(dim).astype(np.float32)
    return jnp.asarray(H), jnp.asarray(g)


def loop_solve(solver, iters):
    @jax.jit
    def run(H, g):
        def body(it, x):
            # vary the system per iteration so XLA cannot hoist the solve
            Hi = H + (1e-4 * it) * jnp.eye(H.shape[0], dtype=H.dtype)
            return solver(Hi, g + 1e-6 * x)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(g))

    return run


def lu_solve(H, g):
    return jnp.linalg.solve(H, g[:, None])[:, 0]


def chol_solve(H, g):
    L = jnp.linalg.cholesky(H)
    y = jax.scipy.linalg.solve_triangular(L, g, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dim = 6 * n
    out = {"n": n, "dim": dim, "iters": iters}
    for name, solver in [("lu", lu_solve), ("chol", chol_solve)]:
        run = loop_solve(solver, iters)
        H, g = make_spd(dim, 0)
        x = run(H, g)
        jax.block_until_ready(x)  # compile + warmup
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            H, g = make_spd(dim, 1 + r)  # varied inputs (relay cache guard)
            x = run(H, g)
        jax.device_get(x)
        dt = (time.perf_counter() - t0) / reps
        out[f"{name}_wall_per_loop_ms"] = round(dt * 1e3, 1)
        out[f"{name}_ms_per_solve"] = round(dt * 1e3 / iters, 2)
        # cross-check accuracy
        ref = np.linalg.solve(np.asarray(H, np.float64), np.asarray(g, np.float64))
        err = float(np.max(np.abs(np.asarray(x) - ref)))
        out[f"{name}_max_err"] = err
    print(out)


if __name__ == "__main__":
    main()
