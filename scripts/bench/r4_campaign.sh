#!/bin/bash
# Round-4 on-chip measurement campaign (VERDICT r3 items 1-3):
#   A. 316->277 regression bisect: ABBA plain-jit vs AOT dispatch
#   B. winograd bench-level numbers (the headline decider): m=2/m=4
#      train/eval/serve + stash-primal, jit dispatch for round-2
#      comparability + one aot run per mode for hbm_model_gb
#   C. micro group A/Bs (the explainers)
#   D. compile-time A/B (scan_groups x packed_opt) + serving coldstart
#   E. scan_groups/packed_opt runtime parity check
# Each command retries through tunnel dropouts (bench.py exits 2 on a dead
# tunnel; timeout exits 124 on a hang). Results stream to $LOG.
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/r4_campaign.log}
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

# A. regression bisect (ABBA to control tunnel drift)
run 3000 "python -u bench.py --dispatch aot"
run 3000 "python -u bench.py --dispatch jit"
run 3000 "python -u bench.py --dispatch jit"
run 3000 "python -u bench.py --dispatch aot"

# B. winograd benches — m=2 first (parity-grade bf16 numerics)
run 3600 "python -u bench.py --winograd 2 --wino-bs 4 --dispatch jit"
run 3600 "python -u bench.py --eval --winograd 2 --wino-bs 4 --dispatch jit"
run 3600 "python -u bench.py --serve --winograd 2 --wino-bs 4 --dispatch jit"
run 3600 "python -u bench.py --winograd 4 --wino-bs 4 --dispatch jit"
run 3600 "python -u bench.py --eval --winograd 4 --wino-bs 4 --dispatch jit"
run 3600 "python -u bench.py --serve --winograd 4 --wino-bs 4 --dispatch jit"
run 3600 "SRES_WINO_STASH_PRIMAL=1 python -u bench.py --winograd 2 --wino-bs 4 --dispatch jit"
# aot variants: hbm_model_gb for the HBM guard table (VERDICT item 5)
run 3600 "python -u bench.py --winograd 2 --wino-bs 4 --dispatch aot"
run 3600 "SRES_WINO_STASH_PRIMAL=1 python -u bench.py --winograd 2 --wino-bs 4 --dispatch aot"
run 3600 "python -u bench.py --int8-fused --dispatch aot"

# C. micro group A/Bs
for only in group_direct_fwd wino4_group_fwd wino2_group_fwd \
            group_direct_fb wino4_group_fb wino2_group_fb wino4_chain_fwd; do
  run 3000 "python scripts/bench/micro_winograd.py --only $only --bs 4"
done

# D. compile-time A/B + serving coldstart (on-chip)
run 4000 "python scripts/bench/compile_ab.py --combo base"
run 4000 "python scripts/bench/compile_ab.py --combo scan"
run 4000 "python scripts/bench/compile_ab.py --combo packed"
run 4000 "python scripts/bench/compile_ab.py --combo scan,packed"
run 4000 "python scripts/bench/coldstart_ab.py"

# E. compile-lever runtime parity on chip
run 3600 "python -u bench.py --scan-groups --dispatch jit"
run 3600 "python -u bench.py --scan-groups --packed-opt --dispatch jit"

echo DONE >> "$LOG"
