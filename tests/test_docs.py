"""Docs-vs-data consistency: PARITY.md's performance table is generated from
tools/sweep_results.jsonl + BENCH_LAST.json (tools/gen_perf_tables.py) and
this test fails whenever it goes stale — the r4 verdict's stale-numbers
class of bug can no longer recur silently."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_perf_table_is_current():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_perf_tables.py"),
         "--check"], capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"stale PARITY.md performance table:\n{proc.stderr}\n"
        "regenerate with: python tools/gen_perf_tables.py")


def test_generator_filters_annotated_bogus_entries():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        import gen_perf_tables as g
    finally:
        sys.path.pop(0)
    by_metric = g.parse_sweep()
    byol = by_metric.get(
        "pretrain_byol_throughput_audio_seconds_per_s_per_chip", [])
    # The r4 tunnel-timing fluke (8885.58, annotated BOGUS in its unit
    # string) must never resurface as a best value.
    assert all(rec["value"] < 5000 for rec, _ in byol)
