#!/bin/bash
# Round-4 chip batch 1: ATE evidence, scan-to-map tile A/B, sharded map,
# roofline anchor microbenches.  Sequential (one relay tenant).
cd /root/repo
L=bench_artifacts/r4_chip1.log
: > $L
log() { echo "=== $1 ===" >> $L; }

log "device probe + peak microbenches"
timeout 900 python - >> $L 2>&1 << 'PY'
import time, numpy as np, jax, jax.numpy as jnp
import cooper_mapper_tpu
d = jax.devices()[0]
print("device_kind:", d.device_kind, "platform:", d.platform)
# MXU peak probe: big bf16 matmul
for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32_highest")):
    n = 8192
    a = jnp.ones((n, n), dt); b = jnp.ones((n, n), dt)
    f = jax.jit(lambda a, b: a @ b)
    jax.block_until_ready(f(a, b))
    reps = 8; ts = []
    for r in range(reps):
        a2 = a * (1.0 + r * 1e-3)
        t0 = time.perf_counter(); jax.block_until_ready(f(a2, b)); ts.append(time.perf_counter() - t0)
    dt_s = min(ts)
    print(f"matmul {name} {n}^3: {2*n**3/dt_s/1e12:.1f} TFLOP/s ({dt_s*1e3:.1f} ms)")
# HBM bandwidth probe: big f32 copy-scale (read+write)
n = 512 * 1024 * 1024 // 4   # 512 MB array
x = jnp.ones((n,), jnp.float32)
g = jax.jit(lambda x: x * 1.000001)
jax.block_until_ready(g(x))
ts = []
for r in range(6):
    x2 = x + r * 1e-6
    jax.block_until_ready(x2)
    t0 = time.perf_counter(); jax.block_until_ready(g(x2)); ts.append(time.perf_counter() - t0)
bw = 2 * x.nbytes / min(ts) / 1e9
print(f"HBM copy-scale bandwidth: {bw:.0f} GB/s ({min(ts)*1e3:.2f} ms for 512 MB r+w)")
PY

log "pipeline_tpu_ate dense"
timeout 1500 env COOPER_USE_PALLAS=0 python examples/demo_mapping.py 20 /tmp/cooper_demo_map_tpu > bench_artifacts/pipeline_tpu_ate.log 2>&1
grep "ATE" bench_artifacts/pipeline_tpu_ate.log >> $L

log "pipeline_tpu_ate pallas"
timeout 1500 env COOPER_USE_PALLAS=1 python examples/demo_mapping.py 20 /tmp/cooper_demo_map_tpu_pallas > bench_artifacts/pipeline_tpu_ate_pallas.log 2>&1
grep "ATE" bench_artifacts/pipeline_tpu_ate_pallas.log >> $L

log "scan_to_map b256 default tiles (tq256 tm2048)"
timeout 1500 env COOPER_USE_PALLAS=1 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "scan_to_map b256 tq128 tm2048"
timeout 1500 env COOPER_USE_PALLAS=1 COOPER_KNN_TQ=128 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "scan_to_map b256 tq256 tm1024"
timeout 1500 env COOPER_USE_PALLAS=1 COOPER_KNN_TM=1024 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "scan_to_map b256 tq128 tm512"
timeout 1500 env COOPER_USE_PALLAS=1 COOPER_KNN_TQ=128 COOPER_KNN_TM=512 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "scan_to_map b64 default (regression check)"
timeout 1500 env COOPER_USE_PALLAS=1 python benchmarks/bench_scan_match.py 64 >> $L 2>&1
log "sharded_map 8 steps both"
timeout 1800 env COOPER_USE_PALLAS=1 python benchmarks/bench_sharded_map.py 8 both >> $L 2>&1
echo "ALL DONE" >> $L
