#!/bin/bash
# Sequential bench sweep with persistent compilation cache and generous
# per-config timeouts. Appends JSON lines to tools/sweep_results.jsonl.
# Failures append the real traceback tail (never swallow errors).
cd "$(dirname "$0")/.."
out=tools/sweep_results.jsonl
for conf in "$@"; do
  echo "== $conf" | tee -a $out
  log=$(mktemp)
  if env $conf BENCH_STEPS=${BENCH_STEPS:-15} timeout ${BENCH_TIMEOUT:-1800} python bench.py >"$log" 2>&1; then
    grep -v WARNING "$log" | tail -1 | tee -a $out
  else
    echo "== FAILED: $conf (tail of log)" | tee -a $out
    grep -v WARNING "$log" | tail -12 | tee -a $out
  fi
  rm -f "$log"
done
