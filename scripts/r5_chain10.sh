#!/bin/bash
# Round-5 chain10: post-reset cache reseed.
# The 2026-08-20 12:31 sandbox reset emptied .jax_cache/; the driver runs
# bench.py cold at round end, so reseed every bench program now.
set -u
cd /root/repo

wait_for_tpu() {
  for i in $(seq 1 6); do
    if timeout 1200 python -c "import jax; d=jax.devices(); print('TPU OK', d)"; then
      return 0
    fi
    echo "tpu probe $i failed; sleeping 300s"
    sleep 300
  done
  return 1
}

echo "=== chain10 start $(date) ==="
wait_for_tpu || { echo "B_exit=TPU_UNAVAILABLE"; exit 1; }
timeout 3000 python bench.py
echo "B_exit=$?"
echo "=== chain10 done $(date) ==="
