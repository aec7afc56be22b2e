"""Multi-host weak-scaling of the sharded batched odometry solve (CPU sim).

BASELINE.json config 5 asks for >= 80% scaling efficiency from 1 host to 2
hosts.  No second TPU host is reachable here, so this bench runs the REAL
multi-host topology — N ``jax.distributed`` processes forming one global
mesh — on localhost CPU, one virtual device per process (the host has 2
physical cores, so 2 single-device processes is the largest configuration
where ideal weak scaling is physically possible; more devices would measure
core oversubscription, not sharding overhead).

Each process times the same fixed PER-PROCESS batch of sharded odometry
solves through parallel/batch.sharded_odometry_solve on the global mesh.
Efficiency = (N-process aggregate solves/s) / (N * 1-process solves/s).
The solve is pure data parallelism (zero cross-device collectives), so any
loss is jax.distributed dispatch/synchronization overhead — exactly what the
2-host target is about.

Usage:  python benchmarks/bench_multihost.py [per_process_batch]
Prints one JSON line with solves/s at world size 1 and 2 and the efficiency.
"""

import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
# one XLA thread per process: the single-process baseline must not get the
# whole machine's cores or weak scaling vs it measures core reallocation,
# not distribution overhead (host has 2 cores for 2 processes)
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=1 "
    "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
)
os.environ["OMP_NUM_THREADS"] = "1"
sys.path.insert(0, os.environ["COOPER_REPO"])

import numpy as np
import jax
import jax.numpy as jnp

from cooper_mapper_tpu.parallel import distributed

proc_id = int(sys.argv[1])
n_proc = int(sys.argv[2])
per_proc = int(sys.argv[3])
if n_proc > 1:
    distributed.initialize(coordinator=sys.argv[4], num_processes=n_proc,
                           process_id=proc_id)
    assert jax.process_count() == n_proc

from cooper_mapper_tpu.config import OdometryConfig
from cooper_mapper_tpu.parallel import batch as pbatch
from cooper_mapper_tpu.parallel import mesh as pmesh
from bench import build_problem, snug

cfg = OdometryConfig(max_iterations=10)
f_prev, f_cur = build_problem(width=512)
clouds = (snug(f_cur.sharp), snug(f_cur.flat),
          snug(f_prev.less_sharp), snug(f_prev.less_flat))

mesh = pmesh.make_mesh()          # spans all processes
B = per_proc * n_proc
tile = lambda t: jax.tree.map(
    lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), t)
sharp, flat, ref_c, ref_s = (tile(c) for c in clouds)
rng = np.random.RandomState(0)

def solve(x0):
    xs, _ = pbatch.sharded_odometry_solve(
        sharp, flat, ref_c, ref_s, x0, cfg, mesh)
    return xs

jax.block_until_ready(solve(jnp.zeros((B, 6), jnp.float32)))
dts = []
for _ in range(4):
    x0 = jnp.asarray(0.02 * rng.randn(B, 6), jnp.float32)
    t0 = time.perf_counter()
    jax.block_until_ready(solve(x0))
    dts.append(time.perf_counter() - t0)
print(f"RESULT {proc_id} {B / min(dts):.3f}", flush=True)
"""


def run_world(n_proc: int, per_proc: int, script: str) -> float:
    """Launch n_proc processes; return aggregate solves/s (global batch)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        coord = f"localhost:{s.getsockname()[1]}"
    env = {**os.environ, "COOPER_REPO": ROOT}
    env.pop("XLA_FLAGS", None)
    # must be cleared in the PARENT env: /root/.axon_site/sitecustomize.py
    # registers the axon TPU plugin at child interpreter start, before the
    # child script's own os.environ assignments run
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    n_cores = os.cpu_count() or 1
    procs = [
        subprocess.Popen(
            # hard-pin each process to its own core: XLA's CPU client sizes
            # its intra-op pool from the machine, so without pinning the
            # 1-process baseline silently uses every core and the scaling
            # ratio measures core reallocation instead of distribution cost
            ["taskset", "-c", str(i % n_cores), sys.executable, script,
             str(i), str(n_proc), str(per_proc), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=ROOT,
        )
        for i in range(n_proc)
    ]
    rates = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"proc{i} failed:\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT"):
                rates.append(float(line.split()[2]))
    # every process reports the same global-batch rate; take the slowest
    # (the barrier is implicit in block_until_ready over the global array)
    return min(rates)


def main():
    per_proc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False, dir="/tmp"
    ) as f:
        f.write(_CHILD)
        script = f.name
    try:
        t0 = time.time()
        sps1 = run_world(1, per_proc, script)
        sps2 = run_world(2, per_proc, script)
        eff = sps2 / (2.0 * sps1)
        print(json.dumps({
            "metric": "multihost_weak_scaling_cpu_sim",
            "per_process_batch": per_proc,
            "solves_per_s_1proc": round(sps1, 2),
            "solves_per_s_2proc": round(sps2, 2),
            "efficiency_2proc": round(eff, 4),
            "wall_s": round(time.time() - t0, 1),
        }))
    finally:
        os.unlink(script)


if __name__ == "__main__":
    main()
