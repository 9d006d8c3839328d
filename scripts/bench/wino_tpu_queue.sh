#!/bin/bash
# Round-3 Winograd on-chip measurement queue. The axon tunnel drops out for
# hours at a time (CLAUDE.md) — this script waits for it, then runs the
# decisive A/Bs in order of information value. Results land in $LOG; update
# PERF.md "Winograd campaign" and decide:
#   - wino4_group_fwd < group_direct_fwd  => serve/eval headline (bench
#     --serve/--eval --winograd 4), consider winograd-on serving defaults
#   - wino4_group_fb  < group_direct_fb   => train wins too; consider making
#     model.winograd: 4 the flagship bench default (parity numerics)
#   - VMEM compile failure in group_fb    => retry with SRES_WINO_NB_CHUNK=3|2
cd "$(dirname "$0")/../.."
LOG=${LOG:-/tmp/wino_tpu5.log}
: > "$LOG"
UP=0
for i in $(seq 1 60); do
  if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU up after $i probes" >> "$LOG"
    UP=1
    break
  fi
  echo "probe $i: tunnel down" >> "$LOG"
  sleep 240
done
if [ "$UP" != 1 ]; then
  echo "tunnel never came up — aborting queue" >> "$LOG"
  echo DONE >> "$LOG"
  exit 1
fi
for cmd in \
  "python scripts/bench/micro_winograd.py --only group_direct_fwd --bs 4" \
  "python scripts/bench/micro_winograd.py --only wino4_group_fwd --bs 4" \
  "python scripts/bench/micro_winograd.py --only wino2_group_fwd --bs 4" \
  "python scripts/bench/micro_winograd.py --only group_direct_fb --bs 4" \
  "python scripts/bench/micro_winograd.py --only wino4_group_fb --bs 4" \
  "python scripts/bench/micro_winograd.py --only wino2_group_fb --bs 4" \
  "python scripts/bench/micro_winograd.py --only wino4_chain_fwd --bs 4" \
  "python -u bench.py --serve --winograd 2 --wino-bs 4" \
  "python -u bench.py --eval --winograd 2 --wino-bs 4" \
  "python -u bench.py --winograd 2 --wino-bs 4" \
  "python -u bench.py --serve --winograd 4 --wino-bs 4" \
  "python -u bench.py --eval --winograd 4 --wino-bs 4" \
  "python -u bench.py --winograd 4 --wino-bs 4" \
  "SRES_WINO_STASH_PRIMAL=1 python -u bench.py --winograd 2 --wino-bs 4" \
  "python -u bench.py" \
; do
  echo "=== $cmd" >> "$LOG"
  timeout 3000 bash -c "$cmd" >> "$LOG" 2>&1
  echo "--- exit $?" >> "$LOG"
done
echo DONE >> "$LOG"
