#!/bin/bash
# Round-4 chip batch 3: best-of-reps timing convention (congestion-robust)
# for the scan-to-map ladder, b64/b256/b1024, default + REF_GRAN=2048.
cd /root/repo
L=bench_artifacts/r4_chip3.log
: > $L
log() { echo "=== $1 ===" >> $L; }
for B in 64 256 1024; do
  log "b$B default bestofreps"
  timeout 2400 env COOPER_USE_PALLAS=1 python benchmarks/bench_scan_match.py $B >> $L 2>&1
  log "b$B REF_GRAN=2048 bestofreps"
  timeout 2400 env COOPER_USE_PALLAS=1 BENCH_REF_GRAN=2048 python benchmarks/bench_scan_match.py $B >> $L 2>&1
done
echo "ALL DONE" >> $L
