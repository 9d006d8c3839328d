#!/bin/bash
# Round-4 follow-up queue #4: same-day ABBA for the packed_opt default
# flip. The two isolated packed_opt runs (294.0, 318.9 t/s) bracket the
# base 315 within cross-invocation tunnel variance; this interleaves
# base/packed/packed/base back-to-back so both legs share the same
# tunnel conditions. Decision rule: flip pipeline.packed_opt default ON
# if the packed legs are within 3% of the base legs (compile already
# measured at -50%, checkpoint interchange exact both directions).
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/r4_followup4.log}
: > "$LOG"

if [ -f /tmp/r4_fu3.pid ]; then
  while kill -0 "$(cat /tmp/r4_fu3.pid)" 2>/dev/null; do sleep 60; done
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

run 3600 "python -u bench.py --dispatch jit"
run 3600 "python -u bench.py --packed-opt --dispatch jit"
run 3600 "python -u bench.py --packed-opt --dispatch jit"
run 3600 "python -u bench.py --dispatch jit"

echo DONE >> "$LOG"
