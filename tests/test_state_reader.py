"""State-store introspection (Spark 4 statestore/state-metadata sources):
read back the EXACT keyed state a stateful streaming query committed,
without replaying the source."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from weatherdatapipeline_spark.streaming.state_reader import (
    flatten_state,
    read_state,
    state_health_report,
    state_metadata,
)

SCHEMA = "event_id long, ts timestamp, user_id string, value double"


def ts(s):
    return datetime.fromisoformat(s)


def _run_stateful_agg(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sr_src"))
    ckpt = str(tmp_path_factory.mktemp("sr_ckpt"))
    rows = [
        (1, ts("2024-01-01T10:00:00"), "u1", 10.0),
        (2, ts("2024-01-01T10:01:00"), "u1", 5.0),
        (3, ts("2024-01-01T10:02:00"), "u2", 7.0),
        (4, ts("2024-01-01T10:03:00"), "u3", 1.0),
    ]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = stream.groupBy("user_id").agg(
        F.sum("value").alias("sum"), F.count(F.lit(1)).alias("count")
    )
    q = (
        agg.writeStream.format("memory").queryName("sr_agg_sink")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return ckpt


def test_state_metadata_inventory(spark, tmp_path_factory):
    ckpt = _run_stateful_agg(spark, tmp_path_factory)
    md = state_metadata(spark, ckpt).collect()
    assert len(md) == 1
    assert md[0]["operatorName"] == "stateStoreSave"
    assert md[0]["maxBatchId"] >= 0


def test_state_rows_match_batch_aggregate(spark, tmp_path_factory):
    ckpt = _run_stateful_agg(spark, tmp_path_factory)
    flat = flatten_state(read_state(spark, ckpt))
    got = {
        r["key_user_id"]: (r["value_sum"], r["value_count"]) for r in flat.collect()
    }
    assert got == {"u1": (15.0, 2), "u2": (7.0, 1), "u3": (1.0, 1)}


def test_state_health_report_census(spark, tmp_path_factory):
    ckpt = _run_stateful_agg(spark, tmp_path_factory)
    rep = state_health_report(spark, ckpt).collect()
    assert sum(r["n_keys"] for r in rep) == 3  # one state row per user
    assert abs(sum(r["share"] for r in rep) - 1.0) < 0.01
    # ordered hottest-first
    counts = [r["n_keys"] for r in rep]
    assert counts == sorted(counts, reverse=True)
