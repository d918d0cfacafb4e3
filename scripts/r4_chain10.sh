#!/bin/bash
# Round-3 continuation TPU chain, part 10: fresh sandbox (empty .jax_cache,
# /tmp wiped, models/ run artifacts gone) — re-queues everything chains 6-9
# were waiting on when the 2026-08-17/18 axon outage outlasted the session.
# Order = value per chip-minute: (B) bench.py seeds the persistent compile
# cache for the driver's round-end run AND refreshes the three driver
# metrics; (RB*) the in-kernel relative-bias skew hardware checks + A/B that
# decide the VQCPCB_PALLAS_RELBIAS default; (Q*) GQA decode A/B; (G) GRU
# projection-placement A/B; (D) the num_batches=None hang-fix demo.
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain10.pid

echo "=== stage B: driver bench on-chip (seeds the compile cache) ==="
run_stage B 7200 python bench.py

echo "=== stage RB1: hardware grad checks (incl. relbias kernel) ==="
run_stage RB1 3600 python scripts/check_pallas_train_tpu.py

echo "=== stage RB2/RB3: decoder train A/B - skew-in-XLA vs in-kernel ==="
run_stage RB2 5400 env VQCPCB_PALLAS_RELBIAS=0 python scripts/bench_decoder_train.py
run_stage RB3 5400 env VQCPCB_PALLAS_RELBIAS=1 python scripts/bench_decoder_train.py

echo "=== stage RB4: batch-64 decoder train, in-kernel skew ==="
run_stage RB4 5400 env BENCH_DEC_BATCH=64 VQCPCB_PALLAS_RELBIAS=1 \
  python scripts/bench_decoder_train.py

echo "=== stage Q/Q2/Q3: GQA decode A/B ==="
run_stage Q 5400 env BENCH_SAMPLER_BATCH=64 python scripts/bench_sampler.py
run_stage Q2 5400 env BENCH_SAMPLER_BATCH=64 BENCH_KV_HEADS=2 \
  python scripts/bench_sampler.py
run_stage Q3 5400 env BENCH_SAMPLER_BATCH=256 BENCH_KV_HEADS=2 \
  python scripts/bench_sampler.py

echo "=== stage G: BiGRU fwd+bwd A/B (hoist vs scan projection) ==="
run_stage G 5400 python scripts/bench_gru.py

echo "=== stage D: flagship num_batches=None full-corpus epoch (hang demo) ==="
export VQCPCB_WARMUP_STEPS=2000
run_stage D 5400 python main_encoder.py -t \
  -c configs/encoder_random_synthetic.py --num_epochs 1 --num_batches -1

echo "=== chain10 done ==="
