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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; rows-only entries (hash-based
    LSH/MinHash/SimHash internals that SQL can't replicate) are omitted —
    their semantics are pytest-verified against exact operators instead."""
    return dict(ORACLES)
