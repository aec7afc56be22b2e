#!/bin/bash
# Round-4 chip batch 4: headline A/B — shared-tile B+C races (2 distance
# tiles per refresh instead of 3) vs the separate-kernel default.
cd /root/repo
L=bench_artifacts/r4_chip4.log
: > $L
log() { echo "=== $1 ===" >> $L; }
log "headline default (3 tiles/refresh)"
timeout 2400 env COOPER_USE_PALLAS=1 python bench.py >> $L 2>&1
log "headline COOPER_PALLAS_BC=1 (shared B+C tile)"
timeout 2400 env COOPER_USE_PALLAS=1 COOPER_PALLAS_BC=1 python bench.py >> $L 2>&1
log "headline BC=1 repeat"
timeout 2400 env COOPER_USE_PALLAS=1 COOPER_PALLAS_BC=1 python bench.py >> $L 2>&1
log "headline default repeat"
timeout 2400 env COOPER_USE_PALLAS=1 python bench.py >> $L 2>&1
echo "ALL DONE" >> $L
