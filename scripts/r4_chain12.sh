#!/bin/bash
# Round-4 consolidated TPU chain (supersedes r4_chain10.sh + r4_chain11.sh,
# which were queued for a sandbox that was reset before the axon backend
# recovered). ONE script, no inter-chain pidfile waits. Order = value per
# chip-minute against VERDICT r3 "next" items:
#   B      driver bench (NEW v4 quality phase: EMA recipe) — also seeds the
#          persistent compile cache for the driver's round-end bench run
#   RB1    hardware grad checks (fused attention + relbias kernels, incl. the
#          counter-hash dropout-VJP fix commit cf3fa62, never chip-verified)
#   RB2-4  decoder-train A/B skew-in-XLA vs in-kernel (+ batch 64) — decides
#          the VQCPCB_PALLAS_RELBIAS default and the 40 ms bar story
#   Q1-4   GQA decode A/B at batch 64 and 256 (controls + 2 KV heads) —
#          decides n_head_kv's value claim and the shipping sampler config
#   D      num_batches=None full-corpus epoch (the r2 hang-fix on-chip demo)
#   G      BiGRU hoist-vs-scan projection A/B
#   P      flagship encoder train-step profile (roofline confirmation)
#   C1/E1  commitment + EMA scale-up arms, 3 epochs each, identical recipe
#          (the r3 EMA curve's checkpoints died with the old sandbox — fresh
#          arms give clean side-by-side footing)
#   S      relbias quality soak (only meaningful if RB3 wins)
#   C2     extend the commitment arm toward 6 epochs while time remains
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain12.pid

echo "=== stage B: driver bench on-chip (v4 quality phase; seeds compile cache) ==="
run_stage B 7200 python bench.py

echo "=== stage RB1: hardware grad checks (incl. relbias kernel) ==="
run_stage RB1 3600 python scripts/check_pallas_train_tpu.py

echo "=== stage RB2/RB3: decoder train A/B - skew-in-XLA vs in-kernel ==="
run_stage RB2 5400 env VQCPCB_PALLAS_RELBIAS=0 python scripts/bench_decoder_train.py
run_stage RB3 5400 env VQCPCB_PALLAS_RELBIAS=1 python scripts/bench_decoder_train.py

echo "=== stage RB4: batch-64 decoder train, in-kernel skew ==="
run_stage RB4 5400 env BENCH_DEC_BATCH=64 VQCPCB_PALLAS_RELBIAS=1 \
  python scripts/bench_decoder_train.py

echo "=== stage Q1/Q2: GQA decode A/B at batch 64 ==="
run_stage Q1 5400 env BENCH_SAMPLER_BATCH=64 python scripts/bench_sampler.py
run_stage Q2 5400 env BENCH_SAMPLER_BATCH=64 BENCH_KV_HEADS=2 \
  python scripts/bench_sampler.py

echo "=== stage Q3/Q4: GQA decode A/B at batch 256 (production point) ==="
run_stage Q3 5400 env BENCH_SAMPLER_BATCH=256 BENCH_KV_HEADS=2 \
  python scripts/bench_sampler.py
run_stage Q4 5400 env BENCH_SAMPLER_BATCH=256 python scripts/bench_sampler.py

echo "=== stage D: flagship num_batches=None full-corpus epoch (hang demo) ==="
VQCPCB_WARMUP_STEPS=2000 run_stage D 5400 python main_encoder.py -t \
  -c configs/encoder_random_synthetic.py --num_epochs 1 --num_batches -1

echo "=== stage G: BiGRU fwd+bwd A/B (hoist vs scan projection) ==="
run_stage G 5400 python scripts/bench_gru.py

echo "=== stage P: flagship encoder train-step profile ==="
rm -rf /tmp/enc_prof && mkdir -p /tmp/enc_prof
run_stage P 5400 env VQCPCB_PROFILE_DIR=/tmp/enc_prof \
  python main_encoder.py -t -c configs/encoder_random_synthetic.py \
  --num_epochs 1 --num_batches 40
VQCPCB_PLATFORM=cpu python scripts/profile_summary.py /tmp/enc_prof \
  | tee /tmp/enc_prof_summary.txt

export VQCPCB_WARMUP_STEPS=2000

echo "=== stage C1: commitment arm, 3 epochs @1000 batches, batch 64 ==="
run_stage C1 14400 env VQCPCB_REMAT=1 python main_encoder.py -t \
  -c configs_local/scaleup_r3_commitment.py --num_epochs 3 --num_batches 1000

echo "=== stage E1: fresh EMA arm, 3 epochs (same recipe) ==="
run_stage E1 14400 env VQCPCB_REMAT=1 python main_encoder.py -t \
  -c configs_local/scaleup_r3_ema.py --num_epochs 3 --num_batches 1000

echo "=== stage S: relbias quality soak (3 epochs, both arms) ==="
run_stage S 10800 python scripts/soak_pallas_train.py 3 --relbias

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

echo "=== chain12 done ==="
