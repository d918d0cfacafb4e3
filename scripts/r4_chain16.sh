#!/bin/bash
# Round-4 TPU chain, part 16 (queue behind chain15): end-of-round closeout.
#
# F  — full bench.py run under the EXACT defaults the driver will use. The
#      r4 default flips (VQCPCB_GRU_PROJ=scan, VQCPCB_PALLAS_RELBIAS=1)
#      changed bench's compiled programs since chain12's stage B seeded the
#      cache, so without this the driver's round-end bench pays fresh
#      20-40 min remote compiles per program.
# E2 — extend the EMA arm toward the commitment arm's epoch count (chain14
#      C1 + chain15 C2) so the adjudication compares equal-epoch curves.
#      Guarded by a wall-clock deadline (arg 1, epoch seconds): the chip
#      must be idle before the driver's own bench run at round end.
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain16.pid
wait_for_chain /tmp/chain15.pid

DEADLINE=${1:-$(($(date +%s) + 14400))}

echo "=== stage F: bench.py under driver defaults (compile-cache seed) ==="
run_stage F 7200 python bench.py

echo "=== stage E2: even up the EMA arm's epoch count (deadline-guarded) ==="
E_DIR=$(ls -dt models/scaleup_r3_ema_* 2>/dev/null | head -1)
C_DIR=$(ls -dt models/scaleup_r3_commitment_* 2>/dev/null | head -1)
if [ -n "$E_DIR" ] && [ -n "$C_DIR" ]; then
  E_DONE=$(epochs_logged "$E_DIR")
  C_DONE=$(epochs_logged "$C_DIR")
  case "$E_DONE$C_DONE" in
    *[!0-9]*)
      echo "E2_exit=EPOCHS_UNKNOWN (ema='$E_DONE' commitment='$C_DONE')";;
    *)
      NOW=$(date +%s)
      # one scale-up epoch is ~90 min on this chip (chain14 C1); only start
      # if a full epoch + margin fits before the deadline
      if [ "$E_DONE" -lt "$C_DONE" ] && [ $((NOW + 6600)) -lt "$DEADLINE" ]; then
        BUDGET=$((DEADLINE - NOW - 600))
        [ "$BUDGET" -gt 14400 ] && BUDGET=14400
        run_stage E2 "$BUDGET" env VQCPCB_REMAT=1 VQCPCB_PALLAS_RELBIAS=0 \
          python main_encoder.py -t -l \
          -c "$E_DIR/config.py" --num_epochs $((C_DONE - E_DONE)) --num_batches 1000
      else
        echo "E2_exit=SKIPPED (ema=$E_DONE commitment=$C_DONE now=$NOW deadline=$DEADLINE)"
      fi;;
  esac
fi

echo "=== chain16 done ==="
