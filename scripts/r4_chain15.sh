#!/bin/bash
# Round-4 TPU chain, part 15 (launch after chain14's C1 completes): the EMA
# twin + the commitment-arm extension. Both stages pin
# VQCPCB_PALLAS_RELBIAS=0: C1 started minutes before the r4 default flip and
# therefore ran with the XLA-side skew — the EMA/commitment comparison (and
# C1's crash-resumed extension) must hold kernel conditions fixed across
# arms (the kernels are parity-verified, but a controlled experiment doesn't
# lean on that).
set -x
cd /root/repo
source "$(dirname "$0")/tpu_stage_lib.sh"
register_chain_pid /tmp/chain15.pid
wait_for_chain /tmp/chain14.pid

export VQCPCB_WARMUP_STEPS=2000

echo "=== stage E1: fresh EMA arm, 3 epochs (same recipe as C1) ==="
run_stage E1 14400 env VQCPCB_REMAT=1 VQCPCB_PALLAS_RELBIAS=0 \
  python main_encoder.py -t \
  -c configs_local/scaleup_r3_ema.py --num_epochs 3 --num_batches 1000

echo "=== stage C2: extend commitment arm toward 6 epochs (crash-resume) ==="
C_DIR=$(ls -dt models/scaleup_r3_commitment_* 2>/dev/null | head -1)
if [ -n "$C_DIR" ]; then
  DONE=$(epochs_logged "$C_DIR")
  case "$DONE" in
    ''|*[!0-9]*)
      echo "C2_exit=EPOCHS_UNKNOWN (epochs_logged returned '$DONE')";;
    *)
      if [ "$DONE" -lt 6 ]; then
        run_stage C2 14400 env VQCPCB_REMAT=1 VQCPCB_PALLAS_RELBIAS=0 \
          python main_encoder.py -t -l \
          -c "$C_DIR/config.py" --num_epochs $((6 - DONE)) --num_batches 1000
      fi;;
  esac
fi

echo "=== chain15 done ==="
