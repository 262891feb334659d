#!/bin/bash
# Sequential bench sweep with persistent compilation cache and generous
# per-config timeouts. Appends JSON lines to tools/sweep_results.jsonl.
cd "$(dirname "$0")/.."
out=tools/sweep_results.jsonl
for conf in "$@"; do
  echo "== $conf" | tee -a $out
  env $conf BENCH_STEPS=15 timeout 1500 python bench.py 2>&1 | grep -v WARNING | tail -1 | tee -a $out
done
