#!/bin/bash
# Round-4 TPU chain, part 19: adjudicate the packed-QKV lane-block attention
# path (VQCPCB_PALLAS_PACKED_QKV — same kernels, zero layout transposes) and
# the bf16-compute option for the decoder trainer (chain18 BF16D measured
# 29.0 -> 25.4 ms/step at identical loss; this chain adds the quality twin).
#
# Stages:
#   PACK    flagship decoder bench, packed path, f32 compute
#   PACKBF  packed path + VQCPCB_COMPUTE_DTYPE=bfloat16 (candidate shipping)
#   HWCHK   check_pallas_train_tpu.py — now includes packed-vs-unpacked
#           bit-match sections on real hardware (strided lane-block DMA)
#   SOAKBF  soak_pallas_train.py --compute-bf16: 3-epoch twin, f32 vs bf16
#           compute, val-loss curves must track within 5%/epoch
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
wait_for_chain /tmp/chain18.pid
wait_for_chain /tmp/chain17.pid
register_chain_pid /tmp/chain19.pid

run_stage PACK 2700 env VQCPCB_PALLAS_PACKED_QKV=1 BENCH_DEC_STEPS=20 \
  python scripts/bench_decoder_train.py
run_stage PACKBF 2700 env VQCPCB_PALLAS_PACKED_QKV=1 \
  VQCPCB_COMPUTE_DTYPE=bfloat16 BENCH_DEC_STEPS=20 \
  python scripts/bench_decoder_train.py
run_stage HWCHK 2700 python scripts/check_pallas_train_tpu.py
run_stage SOAKBF 7200 python scripts/soak_pallas_train.py --compute-bf16 3
echo "=== chain19 done ==="
