#!/bin/bash
# Round-4 TPU chain, part 20: re-run chain19's stranded packed-QKV stages
# after the Mosaic blocking fix. Chain19's PACK/PACKBF/HWCHK all failed to
# LOWER: d=64-wide per-head blocks of a 512-lane array violate Mosaic's
# 128-lane rule. The packed kernels now block _packed_heads_per_block(h, d)
# heads per grid step (two 64-wide heads = one 128-lane tile at the
# flagship) and slice heads statically in-kernel; CPU interpret parity is
# bit-exact (tests/test_pallas_attention.py::test_relbias_packed_*,
# ::test_relbias_packed_lane_tile_blocking).
#
# Stages (HWCHK first — prove the lowering before burning bench time):
#   HWCHK   check_pallas_train_tpu.py — packed-vs-unpacked bit-match on
#           hardware, incl. the d=64 lane-tile cases and flagship geometry
#   PACK    flagship decoder bench, packed path, f32 compute
#   PACKBF  packed path + bf16 compute (candidate shipping config; compare
#           against chain18's 29.0 f32 / 25.4 bf16 ms/step unpacked numbers)
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
wait_for_chain /tmp/chain19.pid
register_chain_pid /tmp/chain20.pid

run_stage HWCHK 2700 python scripts/check_pallas_train_tpu.py
run_stage PACK 2700 env VQCPCB_PALLAS_PACKED_QKV=1 BENCH_DEC_STEPS=20 \
  python scripts/bench_decoder_train.py
run_stage PACKBF 2700 env VQCPCB_PALLAS_PACKED_QKV=1 \
  VQCPCB_COMPUTE_DTYPE=bfloat16 BENCH_DEC_STEPS=20 \
  python scripts/bench_decoder_train.py
echo "=== chain20 done ==="
rm -f /tmp/chain20.pid
