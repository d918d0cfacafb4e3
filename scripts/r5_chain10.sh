#!/bin/bash
# r5 chain10 (queue behind chain9; single TPU client rule):
#   N1: decoder-train bench with the narrow causal relbias table
#       (VQCPCB_RELBIAS_NARROW=1) — A/B against chain8 D1 (23.9 ms) /
#       D0 (23.5 ms); same seed, so the printed loss doubles as an
#       on-chip numerics check (must match D1's 16.5113 to ~4 digits)
#   K1: attention-kernel attribution with narrow ON — the packed arms
#       should drop by roughly the roll-traffic share (~0.7 ms/layer
#       fwd+bwd at decoder shape)
LOG=/tmp/r5_chain10.log
echo "chain10 queued $(date -u +%H:%M:%S)" >> $LOG
echo $$ > /tmp/r5_chain10.pid
P=$(cat /tmp/r5_chain9.pid 2>/dev/null)
while [ -n "$P" ] && [ -d "/proc/$P" ]; do sleep 60; done
echo "chain9 done, starting $(date -u +%H:%M:%S)" >> $LOG
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

# PM2/PG2: retry the MIDI prior (chain9 PM crashed on the get_prior
# geometry bug, fixed: tables now sized by the PRIOR dataloader's length)
ENC_DIR=$(ls -dt models/encoder_scaleup_midi_* 2>/dev/null | head -1)
DEC_DIR=$(ls -dt models/decoder_scaleup_midi_* 2>/dev/null | head -1)
if [ -n "$ENC_DIR" ] && [ -n "$DEC_DIR" ]; then
  # env contained per-stage so N1/K1 below stay comparable to chain8 D1
  PRIOR_ENV="VQCPCB_MIDI_ENCODER_CONFIG=$ENC_DIR/config.py VQCPCB_MIDI_DECODER_CONFIG=$DEC_DIR/config.py VQCPCB_REMAT=1 VQCPCB_WARMUP_STEPS=300"
  stage PM2 10800 env $PRIOR_ENV python main_prior.py -t -c configs/prior_scaleup_midi.py
  PRI_DIR=$(ls -dt models/prior_scaleup_midi_* 2>/dev/null | head -1)
  if [ -n "$PRI_DIR" ] && [ -f "$PRI_DIR/config.py" ]; then
    stage PG2 7200 env $PRIOR_ENV python main_prior.py -l -g -c "$PRI_DIR/config.py"
  fi
fi

stage N1 5400 env VQCPCB_RELBIAS_NARROW=1 python scripts/bench_decoder_train.py
stage K1 7200 env VQCPCB_RELBIAS_NARROW=1 python scripts/bench_attention_kernels.py
echo "CHAIN10 DONE $(date -u +%H:%M:%S)" >> $LOG
