#!/bin/bash
# Round-4 chip batch 9: pose-graph LM after the shared-assembly refactor
# (regression check vs BENCH_BATTERY_R3: dense n1024 7.3-ish iters/s was
# wrong-key; pcg n1024 133.0, pcg n1024 i100 158.1).
cd /root/repo
L=bench_artifacts/r4_chip9.log
: > $L
echo "=== pose_graph pcg n1024 ===" >> $L
timeout 1500 python benchmarks/bench_pose_graph.py 1024 pcg >> $L 2>&1
echo "=== pose_graph pcg n1024 i100 ===" >> $L
timeout 1500 python benchmarks/bench_pose_graph.py 1024 pcg 100 >> $L 2>&1
echo "=== pose_graph dense n256 ===" >> $L
timeout 1500 python benchmarks/bench_pose_graph.py 256 dense >> $L 2>&1
echo "ALL DONE" >> $L
