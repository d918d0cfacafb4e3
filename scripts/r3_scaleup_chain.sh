#!/bin/bash
# Round-3 long TPU chain (ONE axon client at a time):
#   1. bf16 KV-cache quality evidence (VERDICT #9)
#   2. commitment scale-up arm: 1 epoch with num_batches=None (the epoch-
#      boundary-hang fix demo, VERDICT #4), then resume -t -l to 12 epochs
#      at 1000 batches/epoch (VERDICT #3/#6)
#   3. EMA arm: 6 epochs at 1000 batches/epoch (VERDICT #3)
set -x
cd /root/repo

echo "=== stage 1: bf16 KV-cache quality evidence ==="
timeout 5400 python scripts/measure_kv_dtype_effect.py

echo "=== stage 2a: commitment arm, num_batches=None epoch (hang-fix demo) ==="
export VQCPCB_REMAT=1
export VQCPCB_WARMUP_STEPS=2000
timeout 10800 python main_encoder.py -t -c configs_local/scaleup_r3_commitment.py \
  --num_epochs 1 --num_batches -1
echo "stage2a_exit=$?"

# EMA arm BEFORE the commitment extension: the EMA quantizer has never
# trained at scale (VERDICT r2 Missing #3) while commitment already has the
# round-2 curve, so if the round's clock cuts this chain the comparison
# still gets its novel arm.
echo "=== stage 3: EMA arm, 6 epochs @1000 batches ==="
timeout 14400 python main_encoder.py -t -c configs_local/scaleup_r3_ema.py \
  --num_epochs 6 --num_batches 1000
echo "stage3_exit=$?"

DIR=$(ls -dt models/scaleup_r3_commitment_* 2>/dev/null | head -1)
echo "commitment model dir: $DIR"
if [ -n "$DIR" ]; then
  echo "=== stage 2b: commitment arm, resume to 12 epochs @1000 batches ==="
  timeout 21600 python main_encoder.py -t -l -c "$DIR/config.py" \
    --num_epochs 11 --num_batches 1000
  echo "stage2b_exit=$?"
fi

echo "=== chain done ==="
