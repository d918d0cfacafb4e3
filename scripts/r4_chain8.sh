#!/bin/bash
# Round-4 TPU chain, part 8 (queued behind chain7): isolated GRU-scan A/B —
# hoisted vs in-scan input projection (VQCPCB_GRU_PROJ, ops/gru.py) at the
# flagship encoder geometry, then the full encoder bench under the winner's
# opposite to cross-check end-to-end sensitivity.
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain8.pid
wait_for_chain /tmp/chain7.pid

echo "=== stage G: BiGRU fwd+bwd A/B (hoist vs scan projection) ==="
run_stage G 5400 python scripts/bench_gru.py

echo "=== stage G2: full encoder bench with in-scan projection ==="
run_stage G2 5400 env VQCPCB_GRU_PROJ=scan VQCPCB_BENCH_TRAINED=0 python bench.py

echo "=== chain8 done ==="
