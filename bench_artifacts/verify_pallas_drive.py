"""Verify drive: masked-race + streaming-kNN Pallas kernels on the real TPU.

Exercises the user-facing flow (odometry_solve / scan_match on sim-world
sweeps) with COOPER_USE_PALLAS=1 and cross-checks pose results against the
dense XLA path on the same inputs.
"""
import os
import sys
import time

os.environ["COOPER_USE_PALLAS"] = "1"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import OdometryConfig, ScanMatchConfig
from cooper_mapper_tpu.ops import odometry as odo_ops
from cooper_mapper_tpu.ops import scan_match as sm

from bench import build_problem, snug

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

f_prev, f_cur = build_problem()
sharp, flat = snug(f_cur.sharp), snug(f_cur.flat)
ref_c, ref_s = snug(f_prev.less_sharp), snug(f_prev.less_flat)
x0 = jnp.zeros(6, jnp.float32)
cfg = OdometryConfig()

t0 = time.time()
x_pallas, st = odo_ops.odometry_solve(sharp, flat, ref_c, ref_s, x0, cfg)
x_pallas = np.asarray(jax.device_get(x_pallas))
print(f"odometry pallas solve (compile+run {time.time()-t0:.1f}s):", x_pallas,
      "n_matched", int(st.n_matched), flush=True)

# dense reference in a subprocess-free way: flip the env and re-trace
os.environ["COOPER_USE_PALLAS"] = "0"
odo_ops.odometry_solve.clear_cache()
x_dense, st_d = odo_ops.odometry_solve(sharp, flat, ref_c, ref_s, x0, cfg)
x_dense = np.asarray(jax.device_get(x_dense))
print("odometry dense solve:", x_dense, "n_matched", int(st_d.n_matched),
      flush=True)
err = np.abs(x_pallas - x_dense).max()
print("max |pallas - dense| =", err, flush=True)
assert err < 1e-3, (x_pallas, x_dense)

assert np.isfinite(x_pallas).all() and int(st.n_matched) > 500

# ---- scan-to-map with the streaming kNN kernel ----
os.environ["COOPER_USE_PALLAS"] = "1"
from benchmarks.bench_scan_match import build_problem as build_sm

corner, surf, rc, rs = build_sm()
smcfg = ScanMatchConfig()
t0 = time.time()
r_pallas = sm.scan_match(corner, surf, rc, rs, jnp.zeros(6, jnp.float32), smcfg)
xp = np.asarray(jax.device_get(r_pallas.x))
print(f"scan_match pallas (compile+run {time.time()-t0:.1f}s): x={xp} "
      f"success={bool(r_pallas.success)} score={float(r_pallas.score):.1f}",
      flush=True)

os.environ["COOPER_USE_PALLAS"] = "0"
sm.scan_match.clear_cache()
r_dense = sm.scan_match(corner, surf, rc, rs, jnp.zeros(6, jnp.float32), smcfg)
xd = np.asarray(jax.device_get(r_dense.x))
print(f"scan_match dense: x={xd} success={bool(r_dense.success)} "
      f"score={float(r_dense.score):.1f}", flush=True)
err = np.abs(xp - xd).max()
print("max |pallas - dense| =", err, flush=True)
assert err < 1e-3, (xp, xd)
assert bool(r_pallas.success) == bool(r_dense.success)
print("VERIFY_OK", flush=True)
