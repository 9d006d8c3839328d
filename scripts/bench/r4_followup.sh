#!/bin/bash
# Round-4 follow-up queue (runs after r4_campaign.sh): items the first
# campaign's results motivated.
#   - --scan K: K optimizer steps per dispatch (does hiding host dispatch
#     latency move the b72 headline at all?)
#   - full-size HBM audit through the tunnel (hits the XLA compile cache
#     for modes the campaign already compiled)
#   - winograd serving artifact round-trip ON CHIP (jax.export of the
#     tpu_custom_call path — CPU tests cover interpret mode only)
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/r4_followup.log}
: > "$LOG"

run() {
  local tmo=$1; shift
  local cmd="$*"
  for attempt in 1 2 3; do
    echo "=== [$(date +%H:%M:%S)] (try $attempt) $cmd" >> "$LOG"
    timeout "$tmo" bash -c "$cmd" >> "$LOG" 2>&1
    local rc=$?
    echo "--- exit $rc [$(date +%H:%M:%S)]" >> "$LOG"
    if [ $rc -eq 0 ]; then return 0; fi
    if [ $rc -ne 2 ] && [ $rc -ne 124 ]; then return $rc; fi
    sleep 240
  done
  return 1
}

run 3600 "python -u bench.py --scan 5 --steps 30 --dispatch jit"
run 3600 "python -u bench.py --eval --dispatch jit"
run 3600 "python -u bench.py --serve --dispatch jit"
run 6000 "python scripts/bench/hbm_audit.py"
run 3600 "python -u scripts/bench/export_tpu_check.py"

echo DONE >> "$LOG"
