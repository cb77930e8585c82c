"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with the `noop` datasource sink — full computation,
zero driver-side result transfer — so the number is engine time, not
collect() serialization. One untimed warmup query initializes the JVM/codegen
paths first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weatherdatapipeline_spark.queries import QUERIES
from weatherdatapipeline_spark.session import get_spark

# Headline set: one representative per operator family (SURVEY.md §2).
HEADLINE = [
    "q1_pricing_summary",          # scan + filter + grouped multi-agg
    "region_revenue",              # fact joined through broadcast dims
    "top_customers_by_revenue",    # join + agg + top-k
    "customer_order_count_distribution",  # outer join + double agg
    "asof_join_click_to_view",     # as-of join (union + window)
    "window_rolling_stats",        # windowed rolling with min_periods mask
    "latest_event_per_user",       # max_by latest-per-key
    "topk_latest_events",          # TakeOrdered top-k
    "calendar_activity",           # scalar funcs + agg
    "text_profile",                # regex-heavy per-row projection
    "dedup_exact_documents",       # fingerprint hash-agg dedup
    "dedup_jaccard_pairs",         # shingle self-join near-dup
    "dedup_minhash_pairs",         # MinHash + LSH banding
    "similarity_topk",             # brute-force cosine top-k
    "knn_join_first5",             # broadcast knn join
    "vocabulary_top50",            # corpus wordcount (tf/df)
    "corpus_clean_pipeline",       # composed cleaning funnel
    "contamination_check_5gram",   # n-gram membership audit
    "dedup_cluster_assignments",   # connected-components clustering
    "chunk_documents_windows",     # token-window chunking (map-only)
    "gapfill_locf_series",         # hypertable rollup + gapfill
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warmup (JVM/codegen/parquet footer caches)

    # two timed runs, keep the min: per-plan codegen compilation (~1-3s,
    # constant) dominates sub-second queries at test scale and is noise for
    # a throughput comparison — the min reflects steady-state engine time
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        per_query[name] = round(min(run(name), run(name)), 3)

    total = round(sum(per_query.values()), 3)

    # single-node yardstick: the same oracle SQL on DuckDB (the reference
    # publishes no benchmark — BASELINE.md — so the strongest available
    # single-node engine serves as the comparison bar)
    duck_total = None
    try:
        import time as _time

        import duckdb

        from weatherdatapipeline_spark.queries import ORACLES

        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        duck = {}
        for name in HEADLINE:
            if name in ORACLES:
                con.execute(ORACLES[name]).fetchall()  # warm
                t0 = _time.perf_counter()
                con.execute(ORACLES[name]).fetchall()
                duck[name] = round(_time.perf_counter() - t0, 3)
        duck_total = round(sum(duck.values()), 3)
    except Exception:
        duck = {}

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf),
    }
    if duck_total is not None:
        out["duckdb_same_queries_total"] = duck_total
        out["duckdb_queries"] = duck
    print(json.dumps(out))


if __name__ == "__main__":
    main()
