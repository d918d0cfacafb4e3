#!/bin/bash
# Round-5 TPU chain, part 5: the Lakh-scale stretch config on REAL MIDI
# bytes (VERDICT r4 #1) — encoder_scaleup_midi.py trains on-chip from
# data/midi_corpus (512 SMF files through the stdlib parser). Finite
# num_batches per CLAUDE.md (num_batches=None hung twice at the epoch
# boundary); step checkpoints every 500 steps let -t -l resume mid-epoch.
set -x
cd /root/repo

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

echo "=== chain5 done ==="
