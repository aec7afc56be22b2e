#!/bin/bash
# Round-4 chip batch 2: reference-granule tile A/B for the scan-to-map
# streaming top-k (M % tile_m == 0 gates the tile size), b1024 scaling.
cd /root/repo
L=bench_artifacts/r4_chip2.log
: > $L
log() { echo "=== $1 ===" >> $L; }

log "b256 REF_GRAN=2048 (tm=2048, surf M 5888->6144)"
timeout 1500 env COOPER_USE_PALLAS=1 BENCH_REF_GRAN=2048 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "b256 REF_GRAN=1024 (tm=1024, M=6144)"
timeout 1500 env COOPER_USE_PALLAS=1 BENCH_REF_GRAN=1024 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "b256 REF_GRAN=512 (tm=512, M=6144)"
timeout 1500 env COOPER_USE_PALLAS=1 BENCH_REF_GRAN=512 python benchmarks/bench_scan_match.py 256 >> $L 2>&1
log "b64 REF_GRAN=2048"
timeout 1500 env COOPER_USE_PALLAS=1 BENCH_REF_GRAN=2048 python benchmarks/bench_scan_match.py 64 >> $L 2>&1
log "b1024 best-so-far default"
timeout 2400 env COOPER_USE_PALLAS=1 python benchmarks/bench_scan_match.py 1024 >> $L 2>&1
log "b1024 REF_GRAN=2048"
timeout 2400 env COOPER_USE_PALLAS=1 BENCH_REF_GRAN=2048 python benchmarks/bench_scan_match.py 1024 >> $L 2>&1
echo "ALL DONE" >> $L
