#!/bin/bash
# r5 chain11: narrow-relbias on-chip adjudication (docs/index.md says the
# knob is "pending on-chip adjudication"; the 12:31 reset killed the arm).
# Waits for chain10 (bench.py cache reseed) — single TPU client rule —
# and ONLY starts if the wall clock is before the gate, so it can never
# overlap the driver's end-of-round bench run.
LOG=/tmp/r5_chain11.log
echo "chain11 queued $(date -u +%H:%M:%S)" >> $LOG
echo $$ > /tmp/r5_chain11.pid
P=$(cat /tmp/r5_chain10.pid 2>/dev/null)
while [ -n "$P" ] && [ -d "/proc/$P" ]; do sleep 30; done
cd /root/repo
NOW=$(date -u +%H%M)
if [ "$NOW" -ge 1345 ]; then
  echo "GATE: $NOW past 1345 UTC; skipping to stay clear of the driver" >> $LOG
  exit 0
fi
echo "=== NA: bench_relbias_narrow $(date -u +%H:%M:%S) ===" >> $LOG
timeout 1200 python scripts/bench_relbias_narrow.py >> $LOG 2>&1
echo "NA_exit=$? $(date -u +%H:%M:%S)" >> $LOG
echo "CHAIN11 DONE $(date -u +%H:%M:%S)" >> $LOG
