#!/bin/bash
# Round-3 TPU chain, part 5: written ~3h before round end with the axon
# backend still UNAVAILABLE (9h outage). Short, high-value stages FIRST so
# whatever window appears is spent on (1) the on-chip num_batches=None hang
# demo and (2) bench.py — which also seeds the persistent compile cache for
# the driver's round-end benchmark run — before the long training arms.
set -x
cd /root/repo

wait_for_tpu() {
  for i in $(seq 1 60); do
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

export VQCPCB_WARMUP_STEPS=2000

echo "=== stage D: flagship num_batches=None full-corpus epoch (hang demo) ==="
run_stage D 2700 python main_encoder.py -t \
  -c configs/encoder_random_synthetic.py --num_epochs 1 --num_batches -1

echo "=== stage B: driver bench on-chip (seeds the compile cache) ==="
run_stage B 5400 python bench.py

echo "=== stage C1: commitment arm @1000 batches (remaining time) ==="
VQCPCB_REMAT=1 run_stage C1 10800 env VQCPCB_REMAT=1 python main_encoder.py -t \
  -c configs_local/scaleup_r3_commitment.py --num_epochs 5 --num_batches 1000

echo "=== stage E3: EMA arm resume toward 6 epochs ==="
EMA_DIR=$(ls -dt models/scaleup_r3_ema_* 2>/dev/null | head -1)
EMA_EPOCHS=$(wc -l < "$EMA_DIR/metrics.jsonl" 2>/dev/null || echo 0)
if [ -n "$EMA_DIR" ] && [ "$EMA_EPOCHS" -lt 6 ]; then
  VQCPCB_REMAT=1 run_stage E3 10800 env VQCPCB_REMAT=1 python main_encoder.py -t -l \
    -c "$EMA_DIR/config.py" --num_epochs $((6 - EMA_EPOCHS)) --num_batches 1000
else
  echo "EMA arm already has $EMA_EPOCHS epochs; skipping"
fi

echo "=== chain5 done ==="
