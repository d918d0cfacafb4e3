#!/bin/bash
# Round-4 TPU chain, part 6: measures the fully-fused relative-bias training
# attention kernel (VQCPCB_PALLAS_RELBIAS, ops/pallas_attention.py) on-chip.
# Queued BEHIND chain5 (scripts/r3_scaleup_chain5.sh): waits for that process
# to exit before opening any axon client (ONE client at a time — CLAUDE.md),
# then probe-gates on TPU availability like chain5 does.
set -x
cd /root/repo

# 1. wait for chain5 (training arms) to finish
if [ -f /tmp/chain5.pid ]; then
  C5=$(cat /tmp/chain5.pid)
  while kill -0 "$C5" 2>/dev/null; do
    echo "chain5 ($C5) still running; sleeping 300s"
    sleep 300
  done
fi
echo "chain5 done; starting relbias stages"

wait_for_tpu() {
  for i in $(seq 1 40); do
    if timeout 1500 python -c "import jax; d=jax.devices(); print('TPU OK', d)"; then
      return 0
    fi
    echo "tpu probe $i failed; sleeping 240s"
    sleep 240
  done
  return 1
}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  wait_for_tpu || { echo "${name}_exit=TPU_UNAVAILABLE"; return 1; }
  timeout "$tmo" "$@"
  local rc=$?
  echo "${name}_exit=$rc"
  return $rc
}

echo "=== stage RB1: hardware grad checks (incl. relbias kernel) ==="
run_stage RB1 3600 python scripts/check_pallas_train_tpu.py

echo "=== stage RB2: decoder train step A/B — skew-in-XLA vs in-kernel ==="
run_stage RB2 5400 env VQCPCB_PALLAS_RELBIAS=0 python scripts/bench_decoder_train.py
run_stage RB3 5400 env VQCPCB_PALLAS_RELBIAS=1 python scripts/bench_decoder_train.py

echo "=== stage RB4: batch-64 point (the r3 lead) ==="
run_stage RB4 5400 env BENCH_DEC_BATCH=64 VQCPCB_PALLAS_RELBIAS=1 \
  python scripts/bench_decoder_train.py

echo "=== chain6 done ==="
