#!/bin/bash
# Round-4 TPU chain, part 18: decoder-train profile + the bf16-compute A/B
# that was never re-measured after the r4 kernel flips, then hand the chip
# to the alternating twin-arm extender (chain17 logic) for the remaining
# deadline budget.
#
# Stages:
#   PROF   decoder-train profile under r4 defaults (compile-cached program;
#          the trace decides whether the 30.2 ms step's remainder is MXU
#          tiling, as BENCHMARKS.md claims, or partly bandwidth — the input
#          to any head-pair-packing kernel work)
#   BF16D  bench_decoder_train with VQCPCB_COMPUTE_DTYPE=bfloat16
#   BF16E  bench.py encoder-step-only phase with VQCPCB_COMPUTE_DTYPE=bfloat16
#          (pre-r4 measurement said bf16 was slower: per-step re-tiling in
#          scan bodies — CLAUDE.md; the kernel defaults changed since)
#   ARMS   exec r4_chain17.sh with the remaining deadline
#
# Usage: r4_chain18.sh [deadline_epoch_seconds]
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
wait_for_chain /tmp/chain17.pid
register_chain_pid /tmp/chain18.pid

DEADLINE=${1:-$(($(date +%s) + 21600))}

run_stage PROF 1800 env VQCPCB_PROFILE_DIR=/tmp/dec_prof BENCH_DEC_STEPS=20 \
  python scripts/bench_decoder_train.py
VQCPCB_PLATFORM=cpu python scripts/profile_summary.py /tmp/dec_prof \
  --top 30 > /tmp/dec_prof_summary.txt 2>&1 || true

run_stage BF16D 2700 env VQCPCB_COMPUTE_DTYPE=bfloat16 BENCH_DEC_STEPS=20 \
  python scripts/bench_decoder_train.py

run_stage BF16E 3600 env VQCPCB_COMPUTE_DTYPE=bfloat16 \
  VQCPCB_BENCH_TRAINED=0 VQCPCB_BENCH_SAMPLER=0 python bench.py

# remaining budget: keep the twin-arm curves growing, epoch-aligned
rm -f /tmp/chain18.pid
trap - EXIT
exec "$(dirname "$0")/r4_chain17.sh" "$DEADLINE"
