"""Scaling efficiency of the sharded batched odometry solve.

BASELINE.json config 5 asks for solves/s and scaling efficiency at 1 chip,
1 host, and N >= 2 hosts.  Only one real TPU chip is reachable here, so this
bench measures the data-parallel scaling curve on whatever devices exist:

  * on TPU (1 device): the single-chip throughput point;
  * on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=N: the
    1..N virtual-device curve — it validates that the sharded program adds
    no hidden cross-device traffic (the solve is embarrassingly parallel,
    so ideal scaling == the sharding is right), while absolute numbers come
    from the TPU point.

Per device count d it times a fixed PER-DEVICE batch (weak scaling) and
prints solves/s and efficiency vs d=1.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/bench_scaling.py [per_device_batch]
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
from cooper_mapper_tpu.parallel import batch as pbatch
from cooper_mapper_tpu.parallel import mesh as pmesh

from bench import build_problem, snug


def run(n_dev: int, per_dev: int, clouds, cfg, reps=4):
    mesh = pmesh.make_mesh(n_dev)
    B = per_dev * n_dev
    tile = lambda t: jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), t
    )
    sharp, flat, ref_c, ref_s = (tile(c) for c in clouds)
    rng = np.random.RandomState(0)

    def solve(x0):
        xs, _ = pbatch.sharded_odometry_solve(
            sharp, flat, ref_c, ref_s, x0, cfg, mesh
        )
        return xs

    jax.block_until_ready(solve(jnp.zeros((B, 6), jnp.float32)))
    dts = []
    for _ in range(reps):
        x0 = jnp.asarray(0.02 * rng.randn(B, 6), jnp.float32)
        t0 = time.perf_counter()
        jax.device_get(solve(x0))
        dts.append(time.perf_counter() - t0)
    return B / min(dts)


def main():
    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_avail = len(jax.devices())
    # smaller problem on CPU so the curve is measurable
    on_cpu = jax.default_backend() == "cpu"
    width = 512 if on_cpu else 1024
    cfg = OdometryConfig(max_iterations=25 if not on_cpu else 10)

    f_prev, f_cur = build_problem(width=width)
    clouds = (snug(f_cur.sharp), snug(f_cur.flat),
              snug(f_prev.less_sharp), snug(f_prev.less_flat))

    if on_cpu:
        print("# CPU virtual devices share physical cores: sub-100% weak-"
              "scaling efficiency here measures host oversubscription, not "
              "sharding traffic (the solve has none).", flush=True)
    counts = [d for d in (1, 2, 4, 8, 16) if d <= n_avail]
    base = None
    for d in counts:
        sps = run(d, per_dev, clouds, cfg)
        if base is None:
            base = sps
        eff = sps / (base * d)
        print(f"devices={d:2d}  batch={per_dev * d:4d}  "
              f"{sps:9.1f} solves/s  efficiency={eff:5.1%}", flush=True)


if __name__ == "__main__":
    main()
