#!/bin/bash
# Round-3 TPU chain, part 3: retry the commitment arm (chain2 stage C1 hit a
# transient "TPU backend setup/compile error (Unavailable)" at client
# creation), then the deferred demo + bench stages, ordered by value.
#
# The backend has shown multi-hour unavailability windows, so every stage is
# gated on a probe loop and retried once. ONE axon client at a time: the
# probe itself is a client, run only while nothing else is.
set -x
cd /root/repo

wait_for_tpu() {
  # probe until a TPU client can be created (max ~4h)
  for i in $(seq 1 48); do
    if timeout 1200 python -c "import jax; d=jax.devices(); print('TPU OK', d)"; then
      return 0
    fi
    echo "tpu probe $i failed; sleeping 300s"
    sleep 300
  done
  return 1
}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  for attempt in 1 2; do
    wait_for_tpu || { echo "${name}_exit=TPU_UNAVAILABLE"; return 1; }
    timeout "$tmo" "$@"
    local rc=$?
    echo "${name}_attempt${attempt}_exit=$rc"
    [ "$rc" -eq 0 ] && return 0
    # 124/137/143 = our own timeout: do not re-run, partial progress is saved
    [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ] || [ "$rc" -eq 143 ] && return $rc
  done
  return 1
}

export VQCPCB_REMAT=1
export VQCPCB_WARMUP_STEPS=2000

echo "=== stage C1-retry: commitment arm, 6 epochs @1000 batches ==="
run_stage C1 21600 python main_encoder.py -t -c configs_local/scaleup_r3_commitment.py \
  --num_epochs 6 --num_batches 1000

echo "=== stage E3: finish EMA arm to 6 epochs if the resume stage died ==="
EMA_DIR=$(ls -dt models/scaleup_r3_ema_* 2>/dev/null | head -1)
EMA_EPOCHS=$(wc -l < "$EMA_DIR/metrics.jsonl" 2>/dev/null || echo 0)
if [ -n "$EMA_DIR" ] && [ "$EMA_EPOCHS" -lt 6 ]; then
  run_stage E3 12600 python main_encoder.py -t -l -c "$EMA_DIR/config.py" \
    --num_epochs $((6 - EMA_EPOCHS)) --num_batches 1000
else
  echo "EMA arm already has $EMA_EPOCHS epochs; skipping"
fi

echo "=== stage D: flagship num_batches=None full-corpus epoch (hang demo) ==="
VQCPCB_REMAT= run_stage D 5400 env -u VQCPCB_REMAT python main_encoder.py -t \
  -c configs/encoder_random_synthetic.py --num_epochs 1 --num_batches -1

echo "=== stage B: driver bench on-chip ==="
run_stage B 7200 python bench.py

echo "=== stage P: decoder train step at batch 64 (remat) ==="
BENCH_DEC_BATCH=64 run_stage P 5400 python scripts/bench_decoder_train.py

echo "=== chain3 done ==="
