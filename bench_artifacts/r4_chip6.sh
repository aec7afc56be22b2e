#!/bin/bash
# Round-4 chip batch 6: validate the automatic reference padding (no env)
# and the fixed (device_get-forced) sharded-map bench.
cd /root/repo
L=bench_artifacts/r4_chip6.log
: > $L
log() { echo "=== $1 ===" >> $L; }
log "scan_to_map b64 auto-pad"
timeout 2400 env COOPER_USE_PALLAS=1 python benchmarks/bench_scan_match.py 64 >> $L 2>&1
log "scan_to_map b256 auto-pad"
timeout 2400 env COOPER_USE_PALLAS=1 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "scan_to_map b1024 auto-pad"
timeout 3000 env COOPER_USE_PALLAS=1 python benchmarks/bench_scan_match.py 1024 >> $L 2>&1
log "sharded_map fixed timing"
timeout 2400 env COOPER_USE_PALLAS=1 python benchmarks/bench_sharded_map.py 8 both >> $L 2>&1
echo "ALL DONE" >> $L
