#!/bin/bash
# Round-4 follow-up queue #2: the scan_groups on-chip runs re-queued after
# the remat fix (grad-of-scan stacked residuals OOM'd at 19.4 GB — see
# PERF.md "On-chip compile A/B"; remat_trunk now defaults ON under
# scan_groups). Measures:
#   - compile_ab scan / scan,packed: does the 410->29-conv HLO cut tunnel
#     compile time once it actually fits?
#   - bench --scan-groups [--packed-opt]: the runtime cost of scan+remat at
#     the flagship batch (one extra trunk forward in the backward).
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/r4_followup2.log}
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

run 4000 "python scripts/bench/compile_ab.py --combo scan"
run 4000 "python scripts/bench/compile_ab.py --combo scan,packed"
run 3600 "python -u bench.py --scan-groups --dispatch jit"
run 3600 "python -u bench.py --scan-groups --packed-opt --dispatch jit"
run 3600 "python -u bench.py --scan-groups --dispatch aot"
run 3600 "python -u bench.py --packed-opt --dispatch jit"

echo DONE >> "$LOG"
