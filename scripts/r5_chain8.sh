#!/bin/bash
# r5 chain8 (queue behind chain7's MIDI scale-up; single TPU client rule):
#   D1/D0: decoder-train bench, fused output heads ON (new default) vs OFF
#          — the VERDICT r4 #4 measurement (<20 ms/step target at batch 32)
#   DP:    one profiled fused run (VQCPCB_PROFILE_DIR) for attribution if
#          the target is missed
#   A2:    attention-kernel attribution re-run with the scalar-anchored
#          methodology (the chain7 stage-A numbers were tunnel-transfer
#          dominated — see bench_attention_kernels.py docstring)
#   BB:    full bench.py — validates fused heads + int8 sampler end to end,
#          reseeds the compile cache for the driver's round-end run, and
#          records decoder_sample_vs_baseline (chain7 stage B hit a
#          mid-edit ImportError in the sampler phase)
LOG=/tmp/r5_chain8.log
echo "chain8 queued $(date -u +%H:%M:%S)" >> $LOG
echo $$ > /tmp/r5_chain8.pid
P=$(cat /tmp/r5_chain7.pid 2>/dev/null)
while [ -n "$P" ] && [ -d "/proc/$P" ]; do sleep 60; done
echo "chain7 done, starting $(date -u +%H:%M:%S)" >> $LOG
cd /root/repo

wait_for_tpu() {
  for i in $(seq 1 24); do
    if timeout 1200 python -c "import jax; print('TPU OK', jax.devices())" >> $LOG 2>&1; then
      return 0
    fi
    echo "tpu probe $i failed; sleeping 300s" >> $LOG
    sleep 300
  done
  return 1
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* $(date -u +%H:%M:%S) ===" >> $LOG
  wait_for_tpu || { echo "${name}_exit=TPU_UNAVAILABLE" >> $LOG; return 1; }
  timeout "$tmo" "$@" >> $LOG 2>&1
  echo "${name}_exit=$? $(date -u +%H:%M:%S)" >> $LOG
}

# env prefixes on bash FUNCTION calls persist in the caller — use env(1)
# BB FIRST: it reseeds the compile cache for the driver's round-end
# bench.py run (the operationally critical artifact); measurements after.
stage BB 10800 python bench.py
stage D1 5400 python scripts/bench_decoder_train.py
stage D0 5400 env VQCPCB_FUSED_HEADS=0 python scripts/bench_decoder_train.py
stage A2 7200 python scripts/bench_attention_kernels.py
stage DP 5400 env VQCPCB_PROFILE_DIR=/tmp/r5_decprof_fused python scripts/bench_decoder_train.py
echo "CHAIN8 DONE $(date -u +%H:%M:%S)" >> $LOG
