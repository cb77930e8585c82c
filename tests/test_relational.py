from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from weatherdatapipeline_spark.operators.relational import (
    asof_join,
    banded_histogram,
    latest_per_key,
    ranked_in_group,
    top_k,
)


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), "u1"),  # matches right @09:59
            (2, ts("2024-01-01T10:05:00"), "u1"),  # matches right @10:05 (tie → <=)
            (3, ts("2024-01-01T09:00:00"), "u1"),  # nothing before → null
            (4, ts("2024-01-01T10:00:00"), "u2"),  # other key, no right rows → null
        ],
        "event_id long, ts timestamp, user_id string",
    )
    right = spark.createDataFrame(
        [
            (100, ts("2024-01-01T09:59:00"), "u1"),
            (101, ts("2024-01-01T10:05:00"), "u1"),
        ],
        "r_id long, r_ts timestamp, user_id string",
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="r_ts", right_cols=["r_id"]
    )
    got = {r["event_id"]: r["r_id_matched"] for r in out.collect()}
    assert got == {1: 100, 2: 101, 3: None, 4: None}


def test_latest_per_key_picks_max_ts(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 3, 30.0), ("a", 2, 20.0), ("b", 5, 50.0)],
        "k string, t long, v double",
    )
    got = {r["k"]: (r["t"], r["v"]) for r in latest_per_key(df, "k", "t").collect()}
    assert got == {"a": (3, 30.0), "b": (5, 50.0)}


def test_latest_per_key_tie_is_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 1, 30.0), ("a", 1, 20.0)], "k string, t long, v double"
    )
    for _ in range(3):
        rows = latest_per_key(df, "k", "t").collect()
        assert len(rows) == 1
        assert rows[0]["v"] == 30.0  # greatest full-row struct breaks the tie


def test_top_k_with_tiebreaker(spark):
    df = spark.createDataFrame([(i % 3, i) for i in range(30)], "v long, id long")
    rows = top_k(df, [F.desc("v"), F.col("id")], 5).collect()
    assert [(r["v"], r["id"]) for r in rows] == [(2, 2), (2, 5), (2, 8), (2, 11), (2, 14)]


def test_ranked_in_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 9)], "g string, v long"
    )
    rows = ranked_in_group(df, ["g"], [F.desc("v")], 2).collect()
    got = sorted((r["g"], r["v"], r["rn"]) for r in rows)
    assert got == [("a", 3, 1), ("a", 2, 2), ("b", 9, 1)] or got == sorted(
        [("a", 3, 1), ("a", 2, 2), ("b", 9, 1)]
    )


def test_banded_histogram_edges(spark):
    df = spark.createDataFrame([(v,) for v in [-1.0, 0.0, 9.99, 10.0, 39.9, 40.0]], "t double")
    bands = [("neg", None, 0.0), ("low", 0.0, 10.0), ("mid", 10.0, 40.0), ("hi", 40.0, None)]
    row = df.agg(*banded_histogram(df, "t", bands)).collect()[0]
    # half-open [lo, hi): 0.0 goes to "low", 10.0 to "mid", 40.0 to "hi"
    assert (row["neg"], row["low"], row["mid"], row["hi"]) == (1, 2, 2, 1)


def test_bucket_gapfill_locf_planted(spark):
    from datetime import datetime

    from weatherdatapipeline_spark.operators.timeseries import bucket_gapfill_locf

    rows = [
        ("a", datetime(2024, 1, 1, 0, 5), 10.0),
        ("a", datetime(2024, 1, 1, 0, 40), 20.0),   # same bucket as 0:05
        ("a", datetime(2024, 1, 1, 3, 10), 99.0),   # two empty buckets between
        ("b", datetime(2024, 1, 1, 1, 1), 7.0),     # single-bucket series
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = bucket_gapfill_locf(df, "k", "ts", "v", width_seconds=3600)
    got = {
        (r["k"], r["bucket"].hour): (r["n_rows"], r["value"], r["filled"])
        for r in out.collect()
    }
    assert got == {
        ("a", 0): (2, 15.0, False),
        ("a", 1): (0, 15.0, True),   # carried forward
        ("a", 2): (0, 15.0, True),
        ("a", 3): (1, 99.0, False),
        ("b", 1): (1, 7.0, False),
    }


def test_bucket_gapfill_interpolate_planted(spark):
    from datetime import datetime

    from weatherdatapipeline_spark.operators.timeseries import (
        bucket_gapfill_interpolate,
    )

    rows = [
        ("a", datetime(2024, 1, 1, 0, 30), 10.0),
        ("a", datetime(2024, 1, 1, 3, 30), 40.0),  # 2 empty buckets between
        ("a", datetime(2024, 1, 1, 4, 30), 40.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = bucket_gapfill_interpolate(df, "k", "ts", "v", width_seconds=3600)
    got = {r["bucket"].hour: (r["value"], r["filled"]) for r in out.collect()}
    # linear ramp 10 -> 40 over 3 bucket steps: 10, 20, 30, 40, 40
    assert got == {
        0: (10.0, False),
        1: (20.0, True),
        2: (30.0, True),
        3: (40.0, False),
        4: (40.0, False),
    }
