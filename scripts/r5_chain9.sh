#!/bin/bash
# r5 chain9 (queue behind chain8; single TPU client rule):
#   MD: seq2seq decoder trained ON-CHIP over the chain7 MIDI-trained encoder
#       — completes the Lakh-stretch pipeline on real-SMF-derived tokens
#       (configs/decoder_scaleup_midi.py, 3 epochs @512 batches)
#   MG: generation + reharmonisation from the trained decoder (writes into
#       the model dir) — the full encoder->decoder->sampler path on MIDI data
LOG=/tmp/r5_chain9.log
echo "chain9 queued $(date -u +%H:%M:%S)" >> $LOG
echo $$ > /tmp/r5_chain9.pid
P=$(cat /tmp/r5_chain8.pid 2>/dev/null)
while [ -n "$P" ] && [ -d "/proc/$P" ]; do sleep 60; done
echo "chain8 done, starting $(date -u +%H:%M:%S)" >> $LOG
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

ENC_DIR=$(ls -dt models/encoder_scaleup_midi_* 2>/dev/null | head -1)
if [ -z "$ENC_DIR" ] || [ ! -f "$ENC_DIR/config.py" ]; then
  echo "no trained MIDI encoder dir found; aborting" >> $LOG
  exit 1
fi
echo "using encoder $ENC_DIR" >> $LOG
export VQCPCB_MIDI_ENCODER_CONFIG="$ENC_DIR/config.py"
export VQCPCB_REMAT=1
# decoder/prior runs are 1536 steps with schedule_lr — rescale the
# reference's 10k-step warmup or the whole run sits at ~0.24x LR
export VQCPCB_WARMUP_STEPS=300

stage MD 10800 python main_decoder.py -t -c configs/decoder_scaleup_midi.py

DEC_DIR=$(ls -dt models/decoder_scaleup_midi_* 2>/dev/null | head -1)
if [ -n "$DEC_DIR" ] && [ -f "$DEC_DIR/config.py" ]; then
  stage MG 7200 python main_decoder.py -l -r --num_examples 1 -c "$DEC_DIR/config.py"
  # PM/PG: prior over the MIDI encoder's code sequences + unconditional
  # generation decoded through the trained decoder — third model family on
  # real-SMF-derived tokens (CPU-smoked end-to-end before queuing)
  export VQCPCB_MIDI_DECODER_CONFIG="$DEC_DIR/config.py"
  stage PM 10800 python main_prior.py -t -c configs/prior_scaleup_midi.py
  PRI_DIR=$(ls -dt models/prior_scaleup_midi_* 2>/dev/null | head -1)
  if [ -n "$PRI_DIR" ] && [ -f "$PRI_DIR/config.py" ]; then
    stage PG 7200 python main_prior.py -l -g -c "$PRI_DIR/config.py"
  else
    echo "PG skipped: no prior dir" >> $LOG
  fi
else
  echo "MG skipped: no decoder dir" >> $LOG
fi

# S1024: extend the sampler scaling curve past batch 512 (VERDICT r4 #5
# 'past 265K tokens/s or the HBM/quality limit documented')
stage S1024 7200 env BENCH_SAMPLER_BATCH=1024 python scripts/bench_sampler.py

# DR: decoder-train bench under the hardware-RNG dropout knob (threefry ->
# rbg; A/B against chain8 D1 which runs the same bench on the default)
stage DR 5400 env VQCPCB_RNG_IMPL=rbg python scripts/bench_decoder_train.py

# RL: XLA-cost-analysis roofline of the shipping (fused-heads) train step
stage RL 7200 python scripts/roofline.py

echo "CHAIN9 DONE $(date -u +%H:%M:%S)" >> $LOG
