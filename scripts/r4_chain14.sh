#!/bin/bash
# Round-4 TPU chain, part 14: the long training arms. Everything short from
# chain13 has landed (RB3 30.2 ms — 40 ms bar broken; RB4; Q1-Q4 — GQA
# adjudicated, 259.6K tok/s production point; D — num_batches=None epoch
# demo; G — in-scan GRU projection wins 10%; P — encoder profile). Chain13
# was stopped at C1's compile to cross-check the GRU-projection win
# end-to-end on the headline bench (G2) on the idle chip.
# Order: S first — it is the last evidence gating the VQCPCB_PALLAS_RELBIAS
# default flip this round; then the commitment/EMA scale-up arms.
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain14.pid

export VQCPCB_WARMUP_STEPS=2000

echo "=== stage S: relbias quality soak (3 epochs, both arms) ==="
run_stage S 10800 python scripts/soak_pallas_train.py 3 --relbias

echo "=== stage C1: commitment arm, 3 epochs @1000 batches, batch 64 ==="
run_stage C1 14400 env VQCPCB_REMAT=1 python main_encoder.py -t \
  -c configs_local/scaleup_r3_commitment.py --num_epochs 3 --num_batches 1000

echo "=== stage E1: fresh EMA arm, 3 epochs (same recipe) ==="
run_stage E1 14400 env VQCPCB_REMAT=1 python main_encoder.py -t \
  -c configs_local/scaleup_r3_ema.py --num_epochs 3 --num_batches 1000

echo "=== stage C2: extend commitment arm toward 6 epochs (crash-resume) ==="
C_DIR=$(ls -dt models/scaleup_r3_commitment_* 2>/dev/null | head -1)
if [ -n "$C_DIR" ]; then
  DONE=$(epochs_logged "$C_DIR")
  case "$DONE" in
    ''|*[!0-9]*)
      echo "C2_exit=EPOCHS_UNKNOWN (epochs_logged returned '$DONE')";;
    *)
      if [ "$DONE" -lt 6 ]; then
        run_stage C2 14400 env VQCPCB_REMAT=1 python main_encoder.py -t -l \
          -c "$C_DIR/config.py" --num_epochs $((6 - DONE)) --num_batches 1000
      fi;;
  esac
fi

echo "=== chain14 done ==="
