#!/bin/bash
# Round-4 follow-up queue #3: batch scaling under scan_groups+remat.
# hbm_audit measured the scan_packed train step at 3.34 GB @ b72 (vs the
# unrolled path's 15.65 GB) — 12.4 GB of headroom. If the remat recompute
# cost at b72 is modest, a larger batch may lift tiles/s/chip past the
# unrolled path's 315 (better MXU row utilization at the 48x48 conv
# shapes). Also re-runs the on-chip serving-export check with the jitted
# live comparator (diagnoses the winograd-chain 2.6e-3 mismatch: real
# export bug vs per-compile Mosaic f32 pass config).
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/r4_followup3.log}
: > "$LOG"

# wait for queue #2 (if running) to finish
if [ -f /tmp/r4_resume.pid ]; then
  while kill -0 "$(cat /tmp/r4_resume.pid)" 2>/dev/null; do sleep 60; done
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

run 3600 "python -u bench.py --scan-groups --batch 144 --dispatch jit"
run 3600 "python -u bench.py --scan-groups --batch 288 --dispatch jit"
run 3600 "python -u scripts/bench/export_tpu_check.py"

echo DONE >> "$LOG"
