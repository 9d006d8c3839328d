#!/bin/bash
# Round-4 follow-up queue #6: HBM footprint of the new default train mode
# (packed_opt on) via AOT memory_analysis through the tunnel.
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/r4_followup6.log}
: > "$LOG"

if [ -f /tmp/r4_fu5.pid ]; then
  while kill -0 "$(cat /tmp/r4_fu5.pid)" 2>/dev/null; do sleep 60; done
fi

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

run 2400 "python -u scripts/bench/hbm_audit.py --modes train_packed"

echo DONE >> "$LOG"
