"""One-off: XLA profiler capture of the headline odometry solve.

Builds the exact bench.py problem (batch 512, shared reference), runs one
traced repetition, and writes the perfetto trace for
benchmarks/trace_summary.py — where does the 25-iteration solve spend its
device time now that the refresh races are shared-tile + shared-reference?

Usage: COOPER_XLA_TRACE=bench_artifacts/xla_trace_headline python benchmarks/exp_headline_trace.py
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
    os.environ.setdefault("COOPER_USE_PALLAS", "1")
    trace_dir = os.environ.get("COOPER_XLA_TRACE", "bench_artifacts/xla_trace_headline")
    cfg = OdometryConfig()

    f_prev, f_cur = build_problem()
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), t
    )
    sharp, flat = tile(snug(f_cur.sharp)), tile(snug(f_cur.flat))
    ref_c, ref_s = snug(f_prev.less_sharp), snug(f_prev.less_flat)

    solve = jax.jit(
        lambda a, b, c, d, x: odo_ops.batch_odometry_solve(a, b, c, d, x, cfg)[0]
    )
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
    jax.block_until_ready(solve(sharp, flat, ref_c, ref_s, x0))

    x0r = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        jax.device_get(solve(sharp, flat, ref_c, ref_s, x0r))
        dt = time.perf_counter() - t0
    print(f"traced rep: {dt*1e3:.1f} ms -> {batch/dt:.1f} solves/s; trace in {trace_dir}")


if __name__ == "__main__":
    main()
