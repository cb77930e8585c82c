"""Chunking coverage and packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherdatapipeline_spark.operators.chunking import (
    chunk_documents,
    pack_contiguous,
    pack_first_fit,
    tokens_col,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_chunk_exact_windows(spark):
    d = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id BIGINT, text STRING")
    got = {
        r["chunk_id"]: r["chunk_text"]
        for r in chunk_documents(d, window=5, stride=3).collect()
    }
    assert got == {0: "a b c d e", 1: "d e f g h", 2: "g h"}


def test_chunk_nonoverlapping_reconstructs(docs):
    """window == stride: concatenating a doc's chunks yields the doc."""
    chunks = chunk_documents(docs.limit(50), window=30, stride=30)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_id")
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("chunk_text")).alias("joined"))
    )
    orig = docs.limit(50).select(
        "doc_id", F.array_join(tokens_col("text"), " ").alias("expect")
    )
    bad = rebuilt.join(orig, "doc_id").filter("joined != expect").count()
    assert bad == 0


def test_chunk_validates_args(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0, stride=3)


def _with_tokens(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, n_tokens BIGINT")


def test_pack_contiguous_known(spark):
    t = _with_tokens(spark, [(1, 100), (2, 100), (3, 100), (4, 100)])
    # single shard -> the classic global cumulative packing
    got = {
        r["doc_id"]: r["bin_id"]
        for r in pack_contiguous(t, budget=250, n_shards=1).collect()
    }
    # cum-before: 0,100,200,300 -> bins 0,0,0,1
    assert got == {1: 0, 2: 0, 3: 0, 4: 1}


def test_pack_contiguous_shard_local(spark):
    """Default packing is shard-local: bin assignment within a shard must
    equal a global pack of that shard alone, and the window must be
    partitioned (parallel), not a single global sort."""
    t = _with_tokens(spark, [(i, 70 + i) for i in range(1, 41)])
    packed = pack_contiguous(t, budget=200, n_shards=4)
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == set(range(1, 41))
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert len(by_shard) > 1  # docs actually spread across shards
    for members in by_shard.values():
        cum = 0
        for r in members:  # doc_id order within the shard
            assert r["bin_id"] == cum // 200
            cum += r["n_tokens"]
    # plan: the Window partitions by shard (hashpartitioning), never
    # Exchange SinglePartition feeding the sort
    plan = packed._sc._jvm.PythonSQLUtils.explainString(
        packed._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan


def test_pack_contiguous_custom_shard_col(spark):
    t = spark.createDataFrame(
        [(1, 100, "a"), (2, 200, "a"), (3, 150, "b")],
        "doc_id BIGINT, n_tokens BIGINT, day STRING",
    )
    got = {
        r["doc_id"]: (r["shard_id"], r["bin_id"])
        for r in pack_contiguous(t, budget=250, shard_col="day").collect()
    }
    assert got == {1: ("a", 0), 2: ("a", 0), 3: ("b", 0)}


def test_pack_first_fit_invariants(spark, docs):
    with_tokens = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("bigint").alias("n_tokens")
    )
    packed = pack_first_fit(with_tokens, budget=300, n_groups=4)
    assert packed.count() == docs.count()  # every doc assigned
    assert packed.select("doc_id").distinct().count() == docs.count()  # once
    over = (
        packed.groupBy("group_id", "bin_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
        .filter("tot > 300 AND n > 1")  # only single-oversize-doc bins may exceed
        .count()
    )
    assert over == 0


def test_pack_first_fit_deterministic(spark, docs):
    with_tokens = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("bigint").alias("n_tokens")
    )
    a = sorted(map(tuple, pack_first_fit(with_tokens, budget=300).collect()))
    b = sorted(map(tuple, pack_first_fit(with_tokens, budget=300).collect()))
    assert a == b
