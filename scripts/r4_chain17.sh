#!/bin/bash
# Round-4 TPU chain, part 17 (post-closeout bonus epochs): extend the twin
# quantizer arms (VERDICT r3 item 4 asked for deeper curves) ONE EPOCH AT A
# TIME, ALTERNATING, so the two curves stay epoch-aligned whenever the round
# is torn down. Kernel conditions stay pinned to the arms' original run
# (VQCPCB_PALLAS_RELBIAS=0, VQCPCB_REMAT=1, warmup 2000) — a controlled
# experiment must not change conditions mid-curve. Every stage is
# deadline-guarded: a steady scale-up epoch is ~39 min on this chip
# (chain14 C1 / chain15 E1), so a stage only starts if ~55 min fit.
#
# Usage: r4_chain17.sh [deadline_epoch_seconds] [max_epochs_per_arm]
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain17.pid

DEADLINE=${1:-$(($(date +%s) + 28800))}
MAX_EPOCHS=${2:-5}

E_DIR=$(ls -dt models/scaleup_r3_ema_* 2>/dev/null | head -1)
C_DIR=$(ls -dt models/arm_commitment_2* 2>/dev/null | head -1)
[ -z "$E_DIR" ] || [ -z "$C_DIR" ] && { echo "chain17: arm dir missing"; exit 1; }

export VQCPCB_WARMUP_STEPS=2000

fits() { [ $(($(date +%s) + 3300)) -lt "$DEADLINE" ]; }

for round in 1 2 3 4; do
  E_DONE=$(epochs_logged "$E_DIR"); C_DONE=$(epochs_logged "$C_DIR")
  case "$E_DONE$C_DONE" in *[!0-9]*) echo "chain17_exit=EPOCHS_UNKNOWN"; exit 1;; esac
  echo "=== chain17 round $round: ema=$E_DONE commitment=$C_DONE epochs ==="
  # extend whichever arm is behind; EMA first on ties (it is the recommended default)
  if [ "$E_DONE" -le "$C_DONE" ] && [ "$E_DONE" -lt "$MAX_EPOCHS" ]; then
    fits || { echo "chain17_exit=DEADLINE"; break; }
    run_stage "E_ep$E_DONE" 3600 env VQCPCB_REMAT=1 VQCPCB_PALLAS_RELBIAS=0 \
      python main_encoder.py -t -l -c "$E_DIR/config.py" --num_epochs 1 --num_batches 1000
  elif [ "$C_DONE" -lt "$MAX_EPOCHS" ]; then
    fits || { echo "chain17_exit=DEADLINE"; break; }
    run_stage "C_ep$C_DONE" 3600 env VQCPCB_REMAT=1 VQCPCB_PALLAS_RELBIAS=0 \
      python main_encoder.py -t -l -c "$C_DIR/config.py" --num_epochs 1 --num_batches 1000
  else
    echo "chain17_exit=MAX_EPOCHS"; break
  fi
done
echo "=== chain17 done ==="
