#!/bin/bash
# Round-4 chip batch 7: hetero configs re-measured with the auto-padded
# 5-NN kernel (bench_hetero drives scan_match -> knn_search).
cd /root/repo
L=bench_artifacts/r4_chip7.log
: > $L
log() { echo "=== $1 ===" >> $L; }
log "hetero b512 pallas auto-pad"
timeout 2400 env COOPER_USE_PALLAS=1 python benchmarks/bench_hetero.py 512 >> $L 2>&1
log "hetero b4096 pallas auto-pad"
timeout 3000 env COOPER_USE_PALLAS=1 python benchmarks/bench_hetero.py 4096 >> $L 2>&1
echo "ALL DONE" >> $L
