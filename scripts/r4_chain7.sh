#!/bin/bash
# Round-4 TPU chain, part 7 (queued behind chain6): qualify the in-kernel
# relative-bias skew for a default flip (quality soak over a real training
# trajectory) and profile the flagship encoder train step to decide whether
# the GRU scan leaves HBM bandwidth on the table (the headline metric is
# GRU-FLOPs bound, BENCHMARKS.md).
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain7.pid
wait_for_chain /tmp/chain6.pid

echo "=== stage S: relbias quality soak (3 epochs, both arms) ==="
run_stage S 10800 python scripts/soak_pallas_train.py 3 --relbias

echo "=== stage P: flagship encoder train-step profile ==="
rm -rf /tmp/enc_prof && mkdir -p /tmp/enc_prof
run_stage P 5400 env VQCPCB_PROFILE_DIR=/tmp/enc_prof \
  python main_encoder.py -t -c configs/encoder_random_synthetic.py \
  --num_epochs 1 --num_batches 40
python scripts/profile_summary.py /tmp/enc_prof | tee /tmp/enc_prof_summary.txt

echo "=== chain7 done ==="
