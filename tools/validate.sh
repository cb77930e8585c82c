#!/usr/bin/env bash
# Full verification ladder (see README "Verification model"):
#   1. pytest  2. DuckDB oracle differential  3. physical-plan audit  4. bench
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 pytest =="
python -m pytest tests/ -q

echo "== 2/4 oracle differential, driver-strict (sf0.01) =="
# --strict compares the pandas/Arrow-converted frames at FULL precision
# and asserts pandas dtype parity per column — the surface the driver's
# hash actually sees (VERDICT r8 items 1/2/7; both r8 driver-red rows
# passed the loose check and fail only under --strict)
python tools/check_oracle.py --strict --emit /tmp/strict_evidence.json /root/testdata/sf0.01

echo "== 2a/4 STRICT artifact completeness (registry == newest stamp) =="
# VERDICT r12 item 1: a query added after the last STRICT refresh must
# fail the round, not ship unstamped
python tools/assert_strict_complete.py

echo "== 2b/4 schedule stability (statistical set) =="
# bit-identical outputs across shuffle-partition settings — the defense
# against the r7/r8 partition-order float drift class (VERDICT history)
python tools/schedule_stability.py /root/testdata/sf0.01

echo "== 3/4 physical-plan audit =="
python tools/explain_audit.py

echo "== 4/4 bench (sf0.1) =="
# NOTE: do not pipe into `python - <<EOF` — the heredoc replaces stdin, so
# the piped JSON is silently lost; write to a file and pass the path.
python bench.py > /tmp/bench_out.json
python tools/assert_bench.py /tmp/bench_out.json
