#!/bin/bash
# Round-3 TPU chain, part 3: retry the commitment arm (chain2 stage C1 hit a
# transient "TPU backend setup/compile error (Unavailable)" at client
# creation), then the deferred demo + bench stages, ordered by value.
set -x
cd /root/repo

export VQCPCB_REMAT=1
export VQCPCB_WARMUP_STEPS=2000

echo "=== stage C1-retry: commitment arm, 6 epochs @1000 batches ==="
timeout 21600 python main_encoder.py -t -c configs_local/scaleup_r3_commitment.py \
  --num_epochs 6 --num_batches 1000
echo "stageC1_exit=$?"

echo "=== stage D: flagship num_batches=None full-corpus epoch (hang demo) ==="
unset VQCPCB_REMAT
timeout 5400 python main_encoder.py -t -c configs/encoder_random_synthetic.py \
  --num_epochs 1 --num_batches -1
echo "stageD_exit=$?"

echo "=== stage B: driver bench on-chip ==="
timeout 7200 python bench.py
echo "stageB_exit=$?"

echo "=== stage P: decoder train step at batch 64 (remat) — tokens/s scaling ==="
VQCPCB_REMAT=1 BENCH_DEC_BATCH=64 timeout 5400 python scripts/bench_decoder_train.py
echo "stageP_exit=$?"

echo "=== chain3 done ==="
