# Shared helpers for chained TPU stage scripts. Source from a chain script:
#
#   source "$(dirname "$0")/tpu_stage_lib.sh"
#   register_chain_pid /tmp/mychain.pid     # so later chains can queue on us
#   wait_for_chain /tmp/earlierchain.pid    # ONE axon client at a time
#   run_stage NAME TIMEOUT_S cmd...
#
# Rationale (CLAUDE.md): one axon TPU client at a time — a second client
# wedges in-flight remote compiles; client creation during UNAVAILABLE
# windows burns ~25 min per attempt, so every stage probe-gates first.
# Earlier chains (r3_scaleup_chain*.sh, r4_relbias_chain6.sh) carry inline
# copies of these helpers, which had already drifted (probe counts, pid
# files written by the launcher instead of the script) — new chains should
# source this file instead.

_proc_start_jiffies() {  # _proc_start_jiffies <pid> — '' if the pid is gone.
  # starttime is overall field 22 of /proc/pid/stat, but comm (field 2) may
  # contain spaces — strip through the closing paren first.
  sed 's/^.*) //' "/proc/$1/stat" 2>/dev/null | awk '{print $20}'
}

register_chain_pid() {  # register_chain_pid <pidfile>
  # pid + start-time: lets wait_for_chain detect pid reuse (a recycled pid
  # would otherwise stall the follower indefinitely)
  echo "$$ $(_proc_start_jiffies $$)" > "$1"
  trap 'rm -f '"$1" EXIT
}

wait_for_chain() {  # wait_for_chain <pidfile> — waits while that pid runs
  local pidfile=$1 grace=${CHAIN_WAIT_GRACE:-120} waited=0
  # The pidfile is written by the earlier chain itself just after launch —
  # poll briefly for it to appear so a follower that starts first doesn't
  # misread "not written yet" as "already finished" (two concurrent chains
  # = two axon TPU clients, the wedge CLAUDE.md warns about).
  while [ ! -f "$pidfile" ] && [ "$waited" -lt "$grace" ]; do
    sleep 5; waited=$((waited + 5))
  done
  if [ ! -f "$pidfile" ]; then
    echo "wait_for_chain: $pidfile absent after ${grace}s — assuming that chain already finished"
    return 0
  fi
  local pid start cur
  read -r pid start < "$pidfile"
  while kill -0 "$pid" 2>/dev/null; do
    cur=$(_proc_start_jiffies "$pid")
    if [ -n "$start" ] && [ "$cur" != "$start" ]; then
      echo "wait_for_chain: pid $pid start-time mismatch ($cur != $start) — stale pidfile, pid reused"
      return 0
    fi
    echo "chain $pid ($pidfile) still running; sleeping 300s"
    sleep 300
  done
}

wait_for_tpu() {  # probe-gate: client creation retries ~25 min internally
  local probes=${TPU_PROBES:-60}
  for i in $(seq 1 "$probes"); do
    if timeout 1500 python -c "import jax; d=jax.devices(); print('TPU OK', d)"; then
      return 0
    fi
    echo "tpu probe $i failed; sleeping 240s"
    sleep 240
  done
  return 1
}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  wait_for_tpu || { echo "${name}_exit=TPU_UNAVAILABLE"; return 1; }
  timeout "$tmo" "$@"
  local rc=$?
  echo "${name}_exit=$rc"
  return $rc
}

epochs_logged() {  # epochs_logged <model_dir> — MetricsWriter's own count
  # (max epoch + 1, torn/corrupt trailing lines skipped) so stage sizing
  # agrees with the resume numbering train_model will actually use;
  # `wc -l metrics.jsonl` over-counts after a timeout kills a mid-write run
  VQCPCB_PLATFORM=cpu python - "$1" <<'PYEOF'
import sys
from vqcpcb_tpu.training.metrics import MetricsWriter
print(MetricsWriter(sys.argv[1], plot=False).epochs_logged())
PYEOF
}
