"""Assert the newest committed STRICT_rNN.json stamps the FULL registry.

VERDICT r12 item 1: the end-of-round snapshot twice shipped a registry
larger than the latest STRICT artifact (r11: COVERAGE header skew; r12:
403 registered vs 400 stamped — `jsd_source_pairs`,
`price_indices_yearly`, `weibull_fit_time_to_convert` landed after the
last refresh). This gate makes that skew a hard validate.sh failure:
every registered query must carry a stamp in the newest STRICT artifact,
so "add a query" forces "re-emit STRICT" before the round can close.

Exit 0 iff len(newest STRICT) == len(queries()) and the name sets match.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(
        (int(m.group(1)), f)
        for f in os.listdir(root)
        for m in [re.match(r"STRICT_r(\d+)\.json$", f)]
        if m
    )
    if not arts:
        print("FAIL no STRICT_rNN.json artifact committed")
        return 1
    rnd, fname = arts[-1]
    with open(os.path.join(root, fname)) as fh:
        stamped = set(json.load(fh))

    from __spark_entry__ import queries

    registry = set(queries())
    missing = sorted(registry - stamped)
    extra = sorted(stamped - registry)
    if missing or extra:
        if missing:
            print(
                f"FAIL {fname} is stale: {len(missing)} registered "
                f"queries unstamped: {', '.join(missing[:10])}"
            )
        if extra:
            print(
                f"FAIL {fname} stamps {len(extra)} queries no longer "
                f"registered: {', '.join(extra[:10])}"
            )
        print(
            f"registry={len(registry)} stamped={len(stamped)} — re-run "
            f"check_oracle.py --strict --emit STRICT_r{rnd:02d}.json"
        )
        return 1
    print(f"ok {fname}: {len(stamped)}/{len(registry)} registered queries stamped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
