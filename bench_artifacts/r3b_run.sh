#!/bin/bash
# Round-3b chip sequence: waits for relay recovery, then measures everything
# queued behind the fused-kernel wedge.  Logs land in bench_artifacts/r3b_*.
cd /root/repo
L=bench_artifacts
mark () { echo "=== $(date -u +%H:%M:%S) $1" >> $L/r3b_driver.log; }

mark "probe loop start"
for i in $(seq 1 12); do
  if timeout 180 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.asarray(np.random.rand(128, 128), jnp.float32)
assert float(x.sum()) > 0
print('ok')" >> $L/r3b_driver.log 2>&1; then
    mark "relay healthy (attempt $i)"
    break
  fi
  mark "relay still wedged (attempt $i); sleeping 600"
  sleep 600
done

mark "headline (default pallas separate kernels)"
timeout 1500 python bench.py > $L/r3b_headline_pallas.log 2>&1
echo "exit=$?" >> $L/r3b_headline_pallas.log

mark "breakdown pallas"
COOPER_USE_PALLAS=1 timeout 1500 python benchmarks/exp_breakdown.py \
  > $L/r3b_breakdown.log 2>&1
echo "exit=$?" >> $L/r3b_breakdown.log

mark "blocks pallas"
COOPER_USE_PALLAS=1 timeout 1800 python benchmarks/exp_blocks.py \
  > $L/r3b_blocks.log 2>&1
echo "exit=$?" >> $L/r3b_blocks.log

mark "scan_to_map b64 pallas"
COOPER_USE_PALLAS=1 timeout 1800 python benchmarks/bench_scan_match.py 64 \
  > $L/r3b_scan_map_pallas.log 2>&1
echo "exit=$?" >> $L/r3b_scan_map_pallas.log

mark "pose-graph HVP formulations"
timeout 1200 python benchmarks/exp_pg_hvp.py 1024 > $L/r3b_pg_hvp.log 2>&1
echo "exit=$?" >> $L/r3b_pg_hvp.log

mark "pose-graph n1024 i100"
timeout 1500 python benchmarks/bench_pose_graph.py 1024 pcg 100 \
  > $L/r3b_pg_i100.log 2>&1
echo "exit=$?" >> $L/r3b_pg_i100.log

mark "layout AoS vs SoA"
timeout 1200 python benchmarks/exp_layout.py 512 2560 25 \
  > $L/r3b_layout.log 2>&1
echo "exit=$?" >> $L/r3b_layout.log

mark "combined B/C kernel A/B (runs last: untested on chip)"
COOPER_PALLAS_BC=1 timeout 1500 python bench.py > $L/r3b_headline_bc.log 2>&1
echo "exit=$?" >> $L/r3b_headline_bc.log

mark "all done"
