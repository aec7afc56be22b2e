#!/bin/bash
# Round-4 chip batch 5: profiled runs for the roofline (scan-to-map b64 and
# headline odometry), traces to /tmp (not committed; derived numbers only).
cd /root/repo
L=bench_artifacts/r4_chip5.log
: > $L
log() { echo "=== $1 ===" >> $L; }
log "scan_to_map b64 traced"
timeout 2400 env COOPER_USE_PALLAS=1 COOPER_XLA_TRACE=/tmp/r4_trace_sm python benchmarks/bench_scan_match.py 64 >> $L 2>&1
echo "ALL DONE" >> $L
