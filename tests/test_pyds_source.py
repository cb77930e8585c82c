"""Custom Python Data Source (sources/pyds.py): batch partition planning,
determinism across partition counts, and the offset-tracked stream."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from weatherdatapipeline_spark.sources import pyds


def _read(spark, **opts):
    pyds.register(spark)
    r = spark.read.format("weather_synth")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_read_shape_and_schema(spark):
    df = _read(spark, n_batches=6, numPartitions=3)
    assert df.count() == 6 * 10  # 10 cities per batch
    assert df.columns == [
        "city", "country", "temperature", "feels_like", "humidity",
        "pressure", "weather", "description", "wind_speed", "timestamp",
    ]
    assert df.select("city").distinct().count() == 10


def test_partition_planning_parallelizes_scan(spark):
    df = _read(spark, n_batches=8, numPartitions=4)
    assert df.rdd.getNumPartitions() == 4


def test_determinism_across_partition_counts(spark):
    a = {tuple(r) for r in _read(spark, n_batches=5, numPartitions=1).collect()}
    b = {tuple(r) for r in _read(spark, n_batches=5, numPartitions=5).collect()}
    assert a == b and len(a) == 50


def test_seed_changes_data(spark):
    a = {tuple(r) for r in _read(spark, n_batches=3, seed=1).collect()}
    b = {tuple(r) for r in _read(spark, n_batches=3, seed=2).collect()}
    assert a != b


def test_timestamps_follow_poll_cadence(spark):
    df = _read(spark, n_batches=4, start_unix=1000, interval_s=300)
    ts = sorted(r[0] for r in df.select("timestamp").distinct().collect())
    assert ts == [1000, 1300, 1600, 1900]


def test_stream_reader_incremental_runs_drain_everything(spark, tmp_path):
    """The incremental-batch pattern: each availableNow run drains the
    offsets prefetched at start (one read() chunk for the simple stream
    reader) and persists its end offset in the checkpoint; re-running
    continues from there, and replayed offsets regenerate identical rows
    (pure function of seed). 7 batches at 2 per trigger -> 4 runs."""
    pyds.register(spark)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    runs = 0
    for _ in range(6):
        stream = (
            spark.readStream.format("weather_synth")
            .option("n_batches", "7")
            .option("batches_per_trigger", "2")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        runs += 1
        n = spark.read.parquet(out_dir).count()
        if n >= 70:
            break
    assert runs == 4  # ceil(7 / 2) incremental runs
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    want = {tuple(r) for r in _read(spark, n_batches=7).collect()}
    assert got == want and len(got) == 70
