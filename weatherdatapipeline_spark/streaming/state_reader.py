"""Streaming state-store introspection (Spark 4 `statestore` /
`state-metadata` data sources).

The ops surface a production streaming deployment needs and batch replay
can't give you: read the ACTUAL keyed state a stateful query has
accumulated in its checkpoint — without stopping the query, without
replaying the source — to answer "is state leaking?", "is one key
partition hot?", "what does this specific key currently hold?".

Reference parity: the reference's scheduler loop (scheduler.py) has no
durable state at all; here state is a first-class, inspectable table.

Scale notes: the state sources read checkpoint files directly —
partition-parallel, no shuffle until the caller aggregates; the health
report is one hash aggregate over (partition_id), bounded by
`numPartitions` rows. Safe against a LIVE query: reads see the last
COMMITTED batch version, never a torn in-flight write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The stateful-operator inventory of a checkpoint: operator id/name,
    store names, partition counts, committed batch range."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Keyed state rows of one stateful operator as (key struct, value
    struct, partition_id). ``batch_id`` pins a historical version when
    the provider retains it (time travel over state)."""
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)


def flatten_state(state: DataFrame) -> DataFrame:
    """key/value structs → flat columns (key_*, value_*) for joining
    against batch tables in parity audits."""
    key_cols = [
        F.col(f"key.{f.name}").alias(f"key_{f.name}")
        for f in state.schema["key"].dataType.fields
    ]
    val_cols = [
        F.col(f"value.{f.name}").alias(f"value_{f.name}")
        for f in state.schema["value"].dataType.fields
    ]
    return state.select(*key_cols, *val_cols, "partition_id")


def state_health_report(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> DataFrame:
    """Per-partition state census: key count + share of total — the
    skew/leak dashboard row. ONE aggregate over the state scan; output
    is bounded by the operator's shuffle-partition count."""
    st = read_state(spark, checkpoint, operator_id)
    per = st.groupBy("partition_id").agg(F.count(F.lit(1)).alias("n_keys"))
    tot = per.agg(F.sum("n_keys").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "partition_id",
            "n_keys",
            F.round(F.col("n_keys") / F.col("total"), 4).alias("share"),
        )
        .orderBy(F.desc("n_keys"), "partition_id")
    )
