#!/bin/bash
# Round-4 TPU chain, part 9 (queued behind chain8): grouped-query attention
# decode A/B — the sampler is bandwidth-bound on KV-cache reads, so KV-head
# sharing (BENCH_KV_HEADS, __graft_entry__._flagship_decoder n_head_kv)
# should convert directly into decode throughput at large batch.
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain9.pid
wait_for_chain /tmp/chain8.pid

echo "=== stage Q: sampler batch 64 — full KV heads (control) ==="
run_stage Q 5400 env BENCH_SAMPLER_BATCH=64 python scripts/bench_sampler.py

echo "=== stage Q2: sampler batch 64 — 2 KV heads (4x smaller caches) ==="
run_stage Q2 5400 env BENCH_SAMPLER_BATCH=64 BENCH_KV_HEADS=2 \
  python scripts/bench_sampler.py

echo "=== stage Q3: sampler batch 256 — 2 KV heads ==="
run_stage Q3 5400 env BENCH_SAMPLER_BATCH=256 BENCH_KV_HEADS=2 \
  python scripts/bench_sampler.py

echo "=== chain9 done ==="
