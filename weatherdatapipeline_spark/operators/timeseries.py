"""Time-series bucketing with gap-filling — the hypertable rollup ops
(TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape) the reference's
5-minute weather cadence implies but never implements (its pandas path
just drops empty intervals).

Spark-first: the dense bucket spine is ``sequence(min, max, step)``
exploded per series key — a per-key array expression, no driver loop, no
UDF. The sparse aggregates left-join onto the spine, and LOCF is
``last(value, ignorenulls=True)`` over an ordered window. One shuffle for
the aggregate, one for the window (same key → AQE reuses the exchange
when the bucket agg is keyed the same way).

At 100 TB: the spine size is |keys| x |buckets| — bound it by bucketing at
a granularity that keeps per-key bucket counts in the thousands, and
partition the window by the series key (never a global orderBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts_col: str, width_seconds: int) -> F.Column:
    """Floor a timestamp to its bucket start (epoch-aligned)."""
    return F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / width_seconds).cast("bigint")
        * width_seconds
    )


def bucket_gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Dense per-key bucket series with empty buckets carried forward.

    Returns (key, bucket, n_rows, value, filled): one row per (key, bucket)
    for every bucket between the KEY'S first and last observation;
    ``value`` is the bucket aggregate, LOCF-filled where the bucket is
    empty; ``filled`` marks carried-forward rows. Leading buckets before a
    key's first observation don't exist (nothing to carry)."""
    agg_fn = getattr(F, agg)
    sparse = (
        df.select(F.col(key_col), time_bucket(ts_col, width_seconds).alias("bucket"),
                  F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), agg_fn(value_col).alias("raw_value"))
    )
    spine = (
        sparse.groupBy(key_col)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {width_seconds} SECONDS"))
            ).alias("bucket"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(sparse, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.last("raw_value", ignorenulls=True).over(w).alias("value"),
            F.col("raw_value").isNull().alias("filled"),
        )
    )


def bucket_gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    width_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Like :func:`bucket_gapfill_locf` but empty buckets LINEARLY
    interpolate between the surrounding observed buckets (TimescaleDB
    ``interpolate()``); a trailing run with no next observation falls back
    to carry-forward. Two extra window passes over the same key ordering —
    same single exchange, AQE reuses the partitioning."""
    agg_fn = getattr(F, agg)
    sparse = (
        df.select(F.col(key_col), time_bucket(ts_col, width_seconds).alias("bucket"),
                  F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), agg_fn(value_col).alias("raw_value"))
    )
    spine = (
        sparse.groupBy(key_col)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {width_seconds} SECONDS"))
            ).alias("bucket"),
        )
    )
    wp = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_bucket = F.when(F.col("raw_value").isNotNull(), F.col("bucket"))
    joined = (
        spine.join(sparse, [key_col, "bucket"], "left")
        .withColumn("prev_v", F.last("raw_value", ignorenulls=True).over(wp))
        .withColumn("prev_b", F.last(obs_bucket, ignorenulls=True).over(wp))
        .withColumn("next_v", F.first("raw_value", ignorenulls=True).over(wn))
        .withColumn("next_b", F.first(obs_bucket, ignorenulls=True).over(wn))
    )
    frac = (
        F.unix_timestamp("bucket") - F.unix_timestamp("prev_b")
    ) / (F.unix_timestamp("next_b") - F.unix_timestamp("prev_b"))
    interpolated = F.when(
        F.col("raw_value").isNotNull(), F.col("raw_value")
    ).when(
        F.col("next_v").isNotNull(),
        F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
    ).otherwise(F.col("prev_v"))
    return joined.select(
        key_col,
        "bucket",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        interpolated.alias("value"),
        F.col("raw_value").isNull().alias("filled"),
    )
