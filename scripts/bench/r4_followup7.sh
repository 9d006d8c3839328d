#!/bin/bash
# Round-4 follow-up queue #7: re-verify the winograd serving export on chip
# after the transform-precision fix (ops/winograd.py precision=HIGHEST) —
# expected: all three pallas graphs now export bitwise vs live.
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/r4_followup7.log}
: > "$LOG"

if [ -f /tmp/r4_fu6.pid ]; then
  while kill -0 "$(cat /tmp/r4_fu6.pid)" 2>/dev/null; do sleep 60; done
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

run 2400 "python -u scripts/bench/export_tpu_check.py"

echo DONE >> "$LOG"
