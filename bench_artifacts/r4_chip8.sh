#!/bin/bash
# Round-4 chip batch 8: confirm the promoted BC-default headline (no env).
cd /root/repo
L=bench_artifacts/r4_chip8.log
: > $L
echo "=== headline new default (BC shared tile, no env) ===" >> $L
timeout 2400 python bench.py >> $L 2>&1
echo "=== headline new default repeat ===" >> $L
timeout 2400 python bench.py >> $L 2>&1
echo "ALL DONE" >> $L
