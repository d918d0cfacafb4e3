#!/bin/bash
# Round-4 TPU chain, part 13: chain12's remaining stages. Chain12 was
# deliberately stopped after RB2 (44.7 ms/step, relbias=0) to root-cause the
# RB1 dropout-VJP failure on the idle chip — outcome: the kernels were
# correct (analytic grad bit-identical to an XLA replica on hardware); the
# finite-difference PROBE was broken by TPU's default bf16 matmul
# precision. Tests fixed, scripts/check_pallas_train_tpu.py re-run green
# (= RB1 done). Completed already: B (bench v4: guard ok, ppl 7.86), RB1,
# RB2.
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain13.pid

echo "=== stage RB3: decoder train, in-kernel skew ==="
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

echo "=== chain13 done ==="
