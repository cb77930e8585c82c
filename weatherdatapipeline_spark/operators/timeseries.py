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


def cusum_changepoint(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Single change-point location per key via CUSUM of daily means: the
    cumulative sum of (daily mean - key mean) peaks in magnitude at the
    most likely level-shift day (Page 1954 / the standard offline CUSUM
    scan). Two key-partitioned passes — a daily agg, then one cumulative
    window over the per-key DAY series (bounded rows per key, never the
    raw events) — plus a vocabulary-sized key-mean broadcast.

    Ties on the rounded peak magnitude resolve to the earliest day.
    Returns (key, change_day 'yyyy-MM-dd', max_abs_cusum, n_days).
    """
    daily = events.groupBy(
        key_col, F.to_date(ts_col).alias("_day")
    ).agg(F.avg(value_col).alias("_m"))
    key_mean = daily.groupBy(key_col).agg(F.avg("_m").alias("_mu"))
    w = Window.partitionBy(key_col).orderBy("_day")
    cusum = F.sum(F.col("_m") - F.col("_mu")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = (
        daily.join(F.broadcast(key_mean), key_col)
        .withColumn("_abs", F.round(F.abs(cusum), 6))
    )
    pick = Window.partitionBy(key_col).orderBy(F.desc("_abs"), F.asc("_day"))
    return (
        scored.withColumn("_rn", F.row_number().over(pick))
        # n_days counts the key's FULL day series, so it must be windowed
        # before the rn==1 cut
        .withColumn(
            "_nd", F.count(F.lit(1)).over(Window.partitionBy(key_col))
        )
        .filter(F.col("_rn") == 1)
        .select(
            key_col,
            F.date_format("_day", "yyyy-MM-dd").alias("change_day"),
            F.col("_abs").alias("max_abs_cusum"),
            F.col("_nd").cast("bigint").alias("n_days"),
        )
    )


def burst_ratios(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    width_seconds: int = 3600,
    trailing_buckets: int = 24,
    min_history: int = 6,
) -> DataFrame:
    """Rate-burst detection: each (key, time-bucket) event count compared
    to the average over the TRAILING ``trailing_buckets`` buckets (RANGE
    frame on the bucket epoch, so calendar gaps shrink the history rather
    than silently stretching it). Buckets with fewer than ``min_history``
    trailing observations emit no ratio (cold start).

    One (key, bucket) agg then one key-partitioned RANGE window — the
    window runs over bucketed rows (|keys| x time), not raw events.
    Returns (key, bucket_s, n_events, baseline, burst_ratio).
    """
    b = (
        events.groupBy(
            key_col,
            (
                (F.unix_timestamp(ts_col) / width_seconds).cast("bigint")
                * width_seconds
            ).alias("bucket_s"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_s")
        .rangeBetween(-trailing_buckets * width_seconds, -width_seconds)
    )
    return (
        b.withColumn("_hist", F.count("_n").over(w))
        .withColumn("_base", F.avg("_n").over(w))
        .filter(F.col("_hist") >= min_history)
        .select(
            key_col,
            "bucket_s",
            F.col("_n").cast("bigint").alias("n_events"),
            F.round("_base", 6).alias("baseline"),
            F.round(F.col("_n") / F.col("_base"), 6).alias("burst_ratio"),
        )
    )


def autocorrelation(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width_seconds: int = 3600,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key sample autocorrelation of the bucketed mean-value series at
    lags 1..``max_lag`` — the seasonality/persistence diagnostic an
    anomaly or forecasting pipeline runs before picking a model.

    Semantics: OBSERVED-series ACF — the series is the bucket-mean values
    ordered by bucket start, and ``lag`` steps over observed buckets
    (empty buckets collapse; pair ``bucket_gapfill_locf`` upstream when
    calendar-aligned lags are required). Each lag is the Pearson sample
    correlation of (x_t, x_{t-lag}), the direct ACF estimator.

    Plan shape: one (key, bucket) aggregate, one key-partitioned ordered
    window emitting all ``max_lag`` lag columns in a single pass, one
    unpivot (``stack`` — map-only), one final (key, lag) aggregate. Two
    shuffles total, both on the series key; the window runs over bucketed
    rows (|keys| x time), never raw events, so a 100 TB event table
    windows over only its bucket count.
    """
    b = df.groupBy(
        key_col,
        (
            (F.unix_timestamp(ts_col) / width_seconds).cast("bigint")
            * width_seconds
        ).alias("bucket_s"),
    ).agg(F.avg(F.col(value_col).cast("double")).alias("_v"))
    w = Window.partitionBy(key_col).orderBy("bucket_s")
    lagged = b.select(
        key_col,
        "_v",
        *[F.lag("_v", k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    stack_args = ", ".join(f"{k}, _l{k}" for k in range(1, max_lag + 1))
    pairs = lagged.selectExpr(
        key_col, "_v", f"stack({max_lag}, {stack_args}) AS (lag, _prev)"
    ).filter(F.col("_prev").isNotNull())
    return (
        pairs.groupBy(key_col, "lag")
        .agg(
            F.round(F.corr("_v", "_prev"), 6).alias("acf"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .withColumn("lag", F.col("lag").cast("long"))
    )
