#!/bin/bash
# r5 chain7 — fresh-sandbox recovery chain (the 2026-08-20 reset killed
# chains 5/6 before they started and emptied .jax_cache):
#   B: bench.py at the flipped r5 defaults (int8 KV + fused prefill,
#      sampler batch 512) — validates the driver artifact end to end AND
#      reseeds the compile cache for the driver's round-end run
#   A: attention-kernel attribution microbench (VERDICT r4 #4 groundwork)
#   M: MIDI-corpus scale-up on-chip (VERDICT r4 #1): 4 epochs @1000
#      batches, step checkpoints every 500 let -t -l resume mid-epoch
set -x
cd /root/repo
echo $$ > /tmp/r5_chain7.pid

wait_for_tpu() {
  for i in $(seq 1 24); do
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
    [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ] || [ "$rc" -eq 143 ] && return $rc
  done
  return 1
}

echo "=== stage B: bench.py at r5 defaults ==="
run_stage B 10800 python bench.py

echo "=== stage A: attention kernel attribution ==="
run_stage A 7200 python scripts/bench_attention_kernels.py

export VQCPCB_REMAT=1
export VQCPCB_WARMUP_STEPS=2000
echo "=== stage M: MIDI-corpus scale-up, 4 epochs @1000 batches ==="
run_stage M 16200 python main_encoder.py -t -c configs/encoder_scaleup_midi.py \
  --num_epochs 4 --num_batches 1000
M_RC=$?

if [ "$M_RC" -ne 0 ]; then
  echo "=== stage M-resume: continue the interrupted MIDI run ==="
  MDIR=$(ls -dt models/encoder_scaleup_midi_* 2>/dev/null | head -1)
  if [ -n "$MDIR" ]; then
    run_stage MR 10800 python main_encoder.py -t -l -c "$MDIR/config.py" \
      --num_epochs 4 --num_batches 1000
  fi
fi

echo "=== chain7 done ==="
