#!/bin/bash
# Round-3 continuation TPU chain, part 11 (queued behind chain10): the
# commitment twin of the EMA scale-up arm. The EMA arm's 3 on-chip epochs
# are in BENCHMARKS.md; its checkpoints were lost with the sandbox (models/
# is a run artifact), so the comparison footing is a FRESH commitment run at
# the identical recipe (batch 64, VQCPCB_REMAT=1, warmup 2000, 1000
# batches/epoch). 3 epochs first (matches the EMA arm's landed span), then
# keep extending while the session lives.
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain11.pid
wait_for_chain /tmp/chain10.pid

export VQCPCB_WARMUP_STEPS=2000

echo "=== stage C1: commitment arm, 3 epochs @1000 batches, batch 64 ==="
run_stage C1 14400 env VQCPCB_REMAT=1 python main_encoder.py -t \
  -c configs_local/scaleup_r3_commitment.py --num_epochs 3 --num_batches 1000

echo "=== stage C2: extend commitment arm toward 6 epochs (crash-resume) ==="
C_DIR=$(ls -dt models/scaleup_r3_commitment_* 2>/dev/null | head -1)
if [ -n "$C_DIR" ]; then
  DONE=$(epochs_logged "$C_DIR")
  if [ "$DONE" -lt 6 ]; then
    run_stage C2 14400 env VQCPCB_REMAT=1 python main_encoder.py -t -l \
      -c "$C_DIR/config.py" --num_epochs $((6 - DONE)) --num_batches 1000
  fi
fi

echo "=== stage E1: fresh EMA arm, 3 epochs (same recipe; old ckpts lost) ==="
run_stage E1 14400 env VQCPCB_REMAT=1 python main_encoder.py -t \
  -c configs_local/scaleup_r3_ema.py --num_epochs 3 --num_batches 1000

echo "=== chain11 done ==="
