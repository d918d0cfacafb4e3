#!/bin/bash
# Round-3 TPU chain, part 2 (ONE axon client at a time). Continues
# scripts/r3_scaleup_chain.sh, which the session boundary killed mid-stage-3:
#   C1. commitment arm (stage 2a never checkpointed): 6 epochs @1000 batches
#       — the apples-to-apples twin of the EMA arm (VERDICT #3/#6)
#   E2. EMA arm: resume -t -l for 3 more epochs (3..5 of the planned 6)
#   D.  num_batches=None full-corpus epoch ON-CHIP at flagship geometry —
#       the affordable on-chip demo of the epoch-boundary fix (VERDICT #4);
#       the scale-up-geometry variant needs >3.5h/epoch at current tunnel
#       speeds and is covered by the same on-device accumulation code path.
#   B.  bench.py — confirm the bf16-KV sampler driver metric (~149K) and the
#       trained-model held-out metrics on the chip.
# The persistent JAX compilation cache (vqcpcb_tpu/__init__.py, .jax_cache/)
# makes crash-resume of any stage skip the 20-75 min remote recompiles.
set -x
cd /root/repo

export VQCPCB_REMAT=1
export VQCPCB_WARMUP_STEPS=2000

echo "=== stage C1: commitment arm, 6 epochs @1000 batches ==="
timeout 21600 python main_encoder.py -t -c configs_local/scaleup_r3_commitment.py \
  --num_epochs 6 --num_batches 1000
echo "stageC1_exit=$?"

echo "=== stage E2: EMA arm resume, +3 epochs @1000 batches ==="
DIR=$(ls -dt models/scaleup_r3_ema_* 2>/dev/null | head -1)
echo "ema model dir: $DIR"
if [ -n "$DIR" ]; then
  timeout 9000 python main_encoder.py -t -l -c "$DIR/config.py" \
    --num_epochs 3 --num_batches 1000
  echo "stageE2_exit=$?"
fi

echo "=== stage D: flagship num_batches=None full-corpus epoch (hang demo) ==="
unset VQCPCB_REMAT
timeout 5400 python main_encoder.py -t -c configs/encoder_random_synthetic.py \
  --num_epochs 1 --num_batches -1
echo "stageD_exit=$?"

echo "=== stage B: driver bench on-chip ==="
timeout 7200 python bench.py
echo "stageB_exit=$?"

echo "=== chain2 done ==="
