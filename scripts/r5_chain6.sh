#!/bin/bash
# r5 chain6 (queue behind chain5's MIDI run):
#   1. attention-kernel attribution microbench (VERDICT r4 #4 groundwork)
#   2. bench.py at the flipped r5 defaults (int8 KV + fused prefill,
#      sampler batch 512) — validates the driver artifact end to end
LOG=/tmp/r5_chain6.log
echo "chain6 queued $(date -u +%H:%M:%S)" >> $LOG
P=$(cat /tmp/r5_chain5.pid 2>/dev/null)
while [ -n "$P" ] && [ -d "/proc/$P" ]; do sleep 30; done
echo "chain5 done, starting $(date -u +%H:%M:%S)" >> $LOG
cd /root/repo

echo "=== ATTNK: attention kernel attribution ===" >> $LOG
timeout 5400 python scripts/bench_attention_kernels.py >> $LOG 2>&1
echo "attnk exit=$? $(date -u +%H:%M:%S)" >> $LOG

echo "=== BENCH: bench.py at r5 defaults ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "bench exit=$? $(date -u +%H:%M:%S)" >> $LOG
echo "CHAIN6 DONE $(date -u +%H:%M:%S)" >> $LOG
