"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``weatherdatapipeline_spark`` — this module is a
thin adapter. See SURVEY.md §2 for the operator inventory each query maps
to, and ``weatherdatapipeline_spark/queries.py`` for the per-query
oracle-parity notes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weatherdatapipeline_spark.queries import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by region/nation — fact scan joined through
    broadcast dimensions, single grouped aggregate (TPC-H Q5 shape; the
    reference's A9 stats document generalized to a star schema)."""
    return QUERIES["region_revenue"](spark, SMOKE_SF_DIR)


def _rotation_order(names: list[str]) -> list[str]:
    """Deterministic registry ordering that rotates the driver's window.

    The driver samples the FIRST 50 registry entries into each round's
    CORRECTNESS window (verified against r1–r12 artifacts), so a static
    order re-samples the same keyhole forever — 353/403 queries had
    never been driver-checked by r12 (VERDICT r12 item 5). This orders
    never-yet-sampled queries first (union of all committed
    CORRECTNESS_r*.json keys = sampled), each group alphabetically and
    rotated by the current round number so consecutive rounds take
    consecutive 50-query slices of the unseen pool. Purely a
    presentation order: the registry contents are unchanged, and the
    rotation is deterministic given the committed artifacts + round.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    sampled: set[str] = set()
    rounds = [0]
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        try:
            with open(f) as fh:
                sampled.update(json.load(fh))
            if m:
                rounds.append(int(m.group(1)))
        except Exception:
            continue
    # malformed env (e.g. SPARK_GRAFT_ROUND=bogus) must not crash the
    # driver's entry surface — fall back to max(rounds)+1 (ADVICE r13).
    # Note: uncommitted CORRECTNESS_r*.json artifacts in the working
    # tree shift this rotation; a fresh clone may order differently.
    try:
        rnd = int(os.environ.get("SPARK_GRAFT_ROUND", ""))
    except ValueError:
        rnd = max(rounds) + 1
    unseen = sorted(n for n in names if n not in sampled)
    seen = sorted(n for n in names if n in sampled)
    if unseen:
        off = (rnd * 50) % len(unseen)
        unseen = unseen[off:] + unseen[:off]
    if seen:
        off = (rnd * 50) % len(seen)
        seen = seen[off:] + seen[:off]
    return unseen + seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query correctness window rotates across rounds."""
    return {n: QUERIES[n] for n in _rotation_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; rows-only entries (hash-based
    LSH/MinHash/SimHash internals that SQL can't replicate) are omitted —
    their semantics are pytest-verified against exact operators instead."""
    return dict(ORACLES)
