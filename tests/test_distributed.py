"""Multi-host simulation: 2 jax.distributed processes on CPU.

The reference's multi-process story is ROS nodes on one machine
(SURVEY.md §2.8); our equivalent is a jax.distributed process group.  This
test spawns two REAL processes, each with 4 virtual CPU devices, forms the
8-device global mesh, and runs the edge-sharded pose-graph LM across it —
the BASELINE "N>=2 hosts" topology, shrunk onto localhost.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 2-process spawns; see pytest.ini

_CHILD = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.environ["COOPER_REPO"])

import numpy as np
import jax
import jax.numpy as jnp

from cooper_mapper_tpu.parallel import distributed

proc_id = int(sys.argv[1])
distributed.initialize(
    coordinator=sys.argv[2], num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2
assert len(jax.devices()) == 8, f"global devices: {len(jax.devices())}"
assert distributed.is_multihost()
sl = distributed.local_batch_slice(16)
assert sl == slice(proc_id * 8, (proc_id + 1) * 8)

from cooper_mapper_tpu.config import PoseGraphConfig
from cooper_mapper_tpu.ops import pose_graph as pg
from cooper_mapper_tpu.parallel import batch as pbatch
from cooper_mapper_tpu.parallel import mesh as pmesh
from cooper_mapper_tpu.utils import se3

# identical graph on both processes (deterministic construction)
rng = np.random.RandomState(0)
cfg = PoseGraphConfig(max_nodes=16, max_edges=16, max_iterations=4,
                      solver="cg", pcg_iters=24)
graph = pg.create(cfg.max_nodes, cfg.max_edges)
poses = [np.eye(4, dtype=np.float32)]
for k in range(1, 12):
    rel = np.asarray(se3.se3_exp(jnp.asarray(0.1 * rng.randn(6), jnp.float32)))
    poses.append(poses[-1] @ rel)
    noise = np.asarray(se3.se3_exp(jnp.asarray(0.05 * rng.randn(6), jnp.float32)))
    graph = pg.add_node(graph, k, jnp.asarray(poses[k] @ noise))
    graph = pg.add_edge(graph, k - 1, k - 1, k, jnp.asarray(rel), jnp.ones(6))
graph = pg.add_node(graph, 0, jnp.asarray(poses[0]))

mesh = pmesh.make_mesh()          # spans both processes: 8 devices
out, diag = pbatch.sharded_pose_graph_optimize(graph, cfg, mesh)
c0 = float(diag["initial_cost"])
c1 = float(diag["final_cost"])
assert np.isfinite(c1) and c1 < 0.5 * c0, (c0, c1)
print(f"proc{proc_id} OK cost {c0:.4f} -> {c1:.4f}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("COOPER_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_pose_graph(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "COOPER_REPO": repo}
    env.pop("XLA_FLAGS", None)  # children set their own device count
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} OK" in out


_CHILD_MAP = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.environ["COOPER_REPO"])

import numpy as np
import jax
import jax.numpy as jnp

from cooper_mapper_tpu.parallel import distributed

proc_id = int(sys.argv[1])
distributed.initialize(
    coordinator=sys.argv[2], num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2 and len(jax.devices()) == 8

from cooper_mapper_tpu.config import MapConfig
from cooper_mapper_tpu.maps import feature_map as fm
from cooper_mapper_tpu.maps import sharded_map as smap
from cooper_mapper_tpu.parallel import mesh as pmesh
from cooper_mapper_tpu.utils import cloud as cloud_lib

CFG = MapConfig(
    n_cubes=(7, 5, 7), cube_size=10.0,
    corner_cube_capacity=128, surf_cube_capacity=256,
    surround_corner_capacity=2048, surround_surf_capacity=4096,
    valid_distance=30.0,
)
rng = np.random.RandomState(0)      # identical clouds on both processes
c = cloud_lib.from_points(
    jnp.asarray(rng.uniform(-25, 25, (400, 3)), jnp.float32))
s = cloud_lib.from_points(
    jnp.asarray(rng.uniform(-25, 25, (1000, 3)), jnp.float32))

mesh = pmesh.make_mesh()            # global 8-device mesh over 2 processes
state = smap.create_sharded(CFG, mesh)
state = smap.add_feature_cloud(state, c, s, CFG, mesh)
state = smap.recenter(state, np.array([12.0, 0.0, 8.0], np.float32), CFG, mesh)
ref_c, ref_s = smap.get_surround(
    state, jnp.asarray([12.0, 0.0, 8.0]), CFG, mesh)

# local single-device reference (plain arrays, no mesh)
single = fm.add_feature_cloud(fm.create(CFG), c, s, CFG)
single = fm.recenter(single, jnp.asarray([12.0, 0.0, 8.0]), CFG)
ref_c1, ref_s1 = fm.get_surround(single, jnp.asarray([12.0, 0.0, 8.0]), CFG)

def pset(cl):
    pts = np.asarray(cl.xyz)[np.asarray(cl.mask)]
    return set(map(tuple, np.round(pts, 5)))

assert pset(ref_c) == pset(ref_c1), (len(pset(ref_c)), len(pset(ref_c1)))
assert pset(ref_s) == pset(ref_s1)
print(f"proc{proc_id} OK surround {int(ref_s.count())} surf pts across "
      f"2 processes", flush=True)
"""


@pytest.mark.skipif(os.environ.get("COOPER_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_sharded_map(tmp_path):
    """The device-sharded cube map (SURVEY §5: per-device cube shards +
    cross-device surround gather) on a REAL 2-process jax.distributed mesh:
    insert, recenter, and the all_gather surround must reproduce the
    single-device map's point set."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "COOPER_REPO": repo}
    env.pop("XLA_FLAGS", None)
    script = tmp_path / "child_map.py"
    script.write_text(_CHILD_MAP)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process sharded-map run timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} OK" in out
