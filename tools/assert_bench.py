"""Assert bench output health: no per-query errors, no superlinear
per-query scale slope (> 1.3x linear). Usage:
``python tools/assert_bench.py /path/to/bench_output.json`` — the file
may contain log noise; the last line starting with '{' is the record.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = sys.argv[1]
    lines = [l for l in open(path) if l.strip().startswith("{")]
    if not lines:
        print(f"no JSON record found in {path}", file=sys.stderr)
        return 1
    # bench.py prints the FULL record then a compact driver-tail summary
    # (no scale_check / machine detail); assert against the last FULL one
    records = []
    for l in lines:
        try:
            records.append(json.loads(l))
        except json.JSONDecodeError:
            continue
    full = [r for r in records if "machine" in r]
    out = (full or records)[-1]
    errs = out.get("errors", {})
    if errs:
        print(f"BENCH ERRORS: {errs}", file=sys.stderr)
        return 1
    sc = out.get("scale_check", {})
    if "error" in sc:
        print(f"SCALE CHECK ERROR: {sc['error']}", file=sys.stderr)
        return 1
    slopes = sc.get("per_query_slope", {})
    bad = {n: s for n, s in slopes.items() if s > 1.3}
    if bad:
        print(f"SUPERLINEAR SLOPES (>1.3x linear): {bad}", file=sys.stderr)
        return 1
    print(
        f"bench ok: total={out['value']}s, slope={sc.get('slope')}, "
        f"per-query slopes all <= 1.3 ({len(slopes)} measured)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
