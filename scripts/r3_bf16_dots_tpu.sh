#!/bin/bash
# Round-3 bf16-dots verification chain: ONE axon client at a time, so the
# stages run strictly sequentially. Logs to stdout (redirect when launching).
set -x
cd /root/repo

echo "=== stage 1: kernel hardware checks (f32 + bf16 sections) ==="
timeout 5400 python scripts/check_pallas_train_tpu.py || exit 1

echo "=== stage 2: decoder train bench, XLA attention path ==="
VQCPCB_PALLAS_ATTENTION_TRAIN=0 BENCH_DEC_STEPS=30 \
  timeout 5400 python scripts/bench_decoder_train.py || exit 1

echo "=== stage 3: decoder train bench, fused kernel exact-f32 dots ==="
VQCPCB_PALLAS_ATTENTION_TRAIN=1 VQCPCB_PALLAS_BF16_DOTS=0 BENCH_DEC_STEPS=30 \
  timeout 5400 python scripts/bench_decoder_train.py || exit 1

echo "=== stage 4: decoder train bench, fused kernel bf16 dots (default) ==="
VQCPCB_PALLAS_ATTENTION_TRAIN=1 VQCPCB_PALLAS_BF16_DOTS=1 BENCH_DEC_STEPS=30 \
  timeout 5400 python scripts/bench_decoder_train.py || exit 1

echo "=== chain done ==="
