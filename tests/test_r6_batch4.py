"""Round-6 batch 4: stream-stream interval join parity, cross-source
gram matrix, BPE pair statistics, temporal CV."""

from __future__ import annotations

from pyspark.sql import functions as F

from weatherdatapipeline_spark.queries import QUERIES


def test_bpe_pair_counts_golden(spark):
    from weatherdatapipeline_spark.operators import dedup as D  # noqa: F401

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "abab")], "doc_id long, text string"
    )

    # inline the same pipeline the query runs, on a hand corpus
    tok_tf = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.length("tok") >= 2)
    )
    pairs = tok_tf.select(
        "tf",
        F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
        "tok",
    ).select("tf", F.col("tok").substr(F.col("i"), F.lit(2)).alias("pair"))
    got = {
        r.pair: r.n
        for r in pairs.groupBy("pair").agg(F.sum("tf").alias("n")).collect()
    }
    # aaab (tf=2): aa, aa, ab -> aa:4 ab:2 ; abab (tf=1): ab, ba, ab -> ab:2 ba:1
    assert got == {"aa": 4, "ab": 4, "ba": 1}


def test_bpe_query_orders_and_limits(spark):
    out = QUERIES["bpe_pair_merge_candidates"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert 0 < len(rows) <= 50
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_cross_source_matrix_single_shared_gram(spark):
    from weatherdatapipeline_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "a b c d e x", "s1"), (2, "a b c d e y", "s2")],
        "doc_id long, text string, source string",
    )
    gs = (
        D.gram_rows(docs, "doc_id", "text", n=5)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    a = gs.select("shingle", F.col("source").alias("source_a"))
    b = gs.select("shingle", F.col("source").alias("source_b"))
    out = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .collect()
    )
    assert len(out) == 1
    assert (out[0].source_a, out[0].source_b, out[0].n_shared_grams) == (
        "s1", "s2", 1,
    )


def test_temporal_cv_constant_error_series(spark):
    # single user, strictly increasing value by 2 -> every persistence
    # error is exactly 2, so each fold's mae == rmse == 2
    rows = [(i, 1000 * i, 7, 2.0 * i) for i in range(1, 101)]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s long, user_id long, value double"
    ).withColumn("ts", F.timestamp_seconds("ts_s"))

    from pyspark.sql import Window

    epoch = F.unix_timestamp("ts")
    b = df.agg(
        *[
            F.round(F.percentile(epoch, F.lit(p)), 4).alias(f"_q{i}")
            for i, p in enumerate([0.2, 0.4, 0.6, 0.8], start=1)
        ]
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scored = (
        df.withColumn("_pred", F.lag("value").over(w))
        .filter(F.col("_pred").isNotNull())
        .crossJoin(F.broadcast(b))
    )
    fold = sum(
        F.when(epoch >= F.col(f"_q{i}"), 1).otherwise(0) for i in range(1, 5)
    )
    out = (
        scored.select(fold.alias("fold"), "_pred", "value")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.abs(F.col("value") - F.col("_pred"))), 6).alias("mae"),
        )
        .collect()
    )
    assert sorted(r.fold for r in out) == [0, 1, 2, 3, 4]
    assert all(r.mae == 2.0 for r in out)
    assert sum(r.n for r in out) == 99


def test_streaming_interval_join_matches_batch(spark):
    sf = "/root/testdata/sf0.001"
    got = QUERIES["streaming_interval_join_pairs"](spark, sf)
    from weatherdatapipeline_spark.queries import _t

    ev = _t(spark, sf, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("view_ts")
    )
    batch = (
        c.join(
            v,
            (c["user_id"] == v["vu"])
            & (v["view_ts"] >= F.expr("click_ts - interval 60 minutes"))
            & (v["view_ts"] <= c["click_ts"]),
        )
        .select(
            "user_id",
            F.unix_micros("view_ts").alias("view_us"),
            F.unix_micros("click_ts").alias("click_us"),
        )
    )
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_observation_metrics_single_pass(spark):
    """df.observe: pipeline health metrics (row count, null count, sum)
    collected DURING the action — no second scan, no separate count()
    jobs. The operational pattern for ETL instrumentation at scale."""
    from pyspark.sql import Observation

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 7.0), (4, None)], "id long, v double"
    )
    obs = Observation("etl_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("v").isNull().cast("int")).alias("null_v"),
        F.sum("v").alias("sum_v"),
    )
    out = observed.filter(F.col("v").isNotNull()).count()  # one action
    assert out == 2
    got = obs.get
    assert got == {"rows": 4, "null_v": 2, "sum_v": 12.0}
