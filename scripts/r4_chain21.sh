#!/bin/bash
# Round-4 TPU chain, part 21 (filler behind chain20): keep extending the
# twin quantizer arms one epoch at a time, alternating, exactly as chain17
# (kernel conditions pinned: RELBIAS=0, REMAT=1, warmup 2000 — a controlled
# experiment must not change conditions mid-curve), and re-copy each arm's
# metrics.jsonl into docs/artifacts/r4_arms/ after every landed epoch so
# the curves survive the round teardown (model dirs do not).
#
# Usage: r4_chain21.sh [deadline_epoch_seconds] [max_epochs_per_arm]
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
wait_for_chain /tmp/chain20.pid
register_chain_pid /tmp/chain21.pid

DEADLINE=${1:-$(($(date +%s) + 14400))}
MAX_EPOCHS=${2:-6}

E_DIR=$(ls -dt models/scaleup_r3_ema_* 2>/dev/null | head -1)
C_DIR=$(ls -dt models/arm_commitment_2* 2>/dev/null | head -1)
[ -z "$E_DIR" ] || [ -z "$C_DIR" ] && { echo "chain21: arm dir missing"; exit 1; }

export VQCPCB_WARMUP_STEPS=2000

fits() { [ $(($(date +%s) + 3300)) -lt "$DEADLINE" ]; }
preserve() {
  cp "$E_DIR/metrics.jsonl" docs/artifacts/r4_arms/ema_metrics.jsonl
  cp "$C_DIR/metrics.jsonl" docs/artifacts/r4_arms/commitment_metrics.jsonl
}

for round in 1 2 3 4 5 6; do
  E_DONE=$(epochs_logged "$E_DIR"); C_DONE=$(epochs_logged "$C_DIR")
  case "$E_DONE$C_DONE" in *[!0-9]*) echo "chain21_exit=EPOCHS_UNKNOWN"; exit 1;; esac
  echo "=== chain21 round $round: ema=$E_DONE commitment=$C_DONE epochs ==="
  if [ "$E_DONE" -le "$C_DONE" ] && [ "$E_DONE" -lt "$MAX_EPOCHS" ]; then
    fits || { echo "chain21_exit=DEADLINE"; break; }
    run_stage "E_ep$E_DONE" 3600 env VQCPCB_REMAT=1 VQCPCB_PALLAS_RELBIAS=0 \
      python main_encoder.py -t -l -c "$E_DIR/config.py" --num_epochs 1 --num_batches 1000
    preserve
  elif [ "$C_DONE" -lt "$MAX_EPOCHS" ]; then
    fits || { echo "chain21_exit=DEADLINE"; break; }
    run_stage "C_ep$C_DONE" 3600 env VQCPCB_REMAT=1 VQCPCB_PALLAS_RELBIAS=0 \
      python main_encoder.py -t -l -c "$C_DIR/config.py" --num_epochs 1 --num_batches 1000
    preserve
  else
    echo "chain21_exit=MAX_EPOCHS"; break
  fi
done
echo "=== chain21 done ==="
rm -f /tmp/chain21.pid
