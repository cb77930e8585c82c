#!/usr/bin/env bash
# Full verification ladder (see README "Verification model"):
#   1. pytest  2. DuckDB oracle differential  3. physical-plan audit  4. bench
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 pytest =="
python -m pytest tests/ -q

echo "== 2/4 oracle differential (sf0.01) =="
python tools/check_oracle.py /root/testdata/sf0.01

echo "== 3/4 physical-plan audit =="
python tools/explain_audit.py

echo "== 4/4 bench (sf0.1) =="
python bench.py | tee /tmp/bench_out.json | python - <<'EOF'
import json, sys
out = json.loads(sys.stdin.read().strip().splitlines()[-1])
errs = out.get("errors", {})
if errs:
    print(f"BENCH ERRORS: {errs}", file=sys.stderr)
    sys.exit(1)
sc = out.get("scale_check", {})
bad = {n: s for n, s in sc.get("per_query_slope", {}).items() if s > 1.3}
if bad:
    print(f"SUPERLINEAR SLOPES (>1.3x linear): {bad}", file=sys.stderr)
    sys.exit(1)
print(f"bench ok: total={out['value']}s, slope={sc.get('slope')}, "
      f"per-query slopes all <= 1.3 ({len(sc.get('per_query_slope', {}))} measured)")
EOF
