"""Document chunking and sequence packing for training-data preparation.

Two pre-tokenization ops every LLM data pipeline runs at corpus scale:

- **Chunking**: split each document into overlapping fixed-size token
  windows. Pure array expressions (sequence + slice + explode) — JVM-side,
  map-only, no shuffle: a 100 TB corpus chunks at scan throughput.

- **Packing**: assign documents to fixed-token-budget training sequences.
  Two strategies with different contracts:

  * ``pack_contiguous`` — streaming/cumulative packing in doc_id order via
    a window cumulative sum, SHARD-LOCAL by default: ids hash into
    ``n_shards`` buckets and the cumulative sum runs per shard, so the
    window is a partitioned sort that parallelizes across executors —
    never a single-task global sort. (shard_id, bin_id) names a training
    sequence. Fully relational, engine-portable, ORACLE-able. A doc whose
    tokens straddle a boundary starts the next bin (bin = floor((cumsum -
    n_tokens) / budget)), so bins can overflow by at most one doc — the
    "pad-free packing" approximation used when throughput matters more
    than tightness.
  * ``pack_first_fit`` — classic greedy first-fit-decreasing, which is
    inherently sequential; runs as applyInPandas per packing group, where
    the group key is a hash bucket of doc_id so each group's doc list fits
    one task comfortably (tune n_groups so corpus_tokens / n_groups ~ tens
    of MB). Bins never exceed the budget (docs longer than the budget get
    their own bin). Not SQL-expressible — verified by invariant tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def tokens_col(text_col: str) -> F.Column:
    """Whitespace tokens of the trimmed, lowercased text (the corpus
    convention shared with operators/text.py + the DuckDB oracles)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def chunk_documents(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Overlapping token windows starting at 1, 1+stride, ... <= n_tokens.
    The tail window may be shorter than ``window``; every token is covered
    when stride <= window. Map-only: no shuffle, no UDF."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = documents.select(
        F.col(id_col), tokens_col(text_col).alias("w")
    ).withColumn("n", F.size("w"))
    return (
        toks.withColumn(
            "start", F.explode(F.sequence(F.lit(1), F.greatest("n", F.lit(1)), F.lit(stride)))
        )
        .select(
            id_col,
            ((F.col("start") - 1) / stride).cast("bigint").alias("chunk_id"),
            F.slice("w", F.col("start"), window).alias("chunk"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("chunk").cast("bigint").alias("n_chunk_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


def pack_contiguous(
    docs_with_tokens: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 32,
    shard_col: str | None = None,
) -> DataFrame:
    """Cumulative packing in ``id_col`` order within a shard: bin =
    floor((cumsum - n_tokens) / budget); (shard_id, bin_id) names a
    training sequence.

    Shard-local by default because a bare ``Window.orderBy`` is a
    single-partition sort — at corpus scale the whole input would
    serialize through one task. Ids hash into ``n_shards`` buckets
    (deterministic, partition-independent md5 bucket shared with
    operators/sampling.py), and the cumulative window partitions by
    shard — parallel and spill-bounded at any scale. Pass ``shard_col``
    to pack within an existing column (e.g. a date) instead.
    """
    if shard_col is None:
        work = docs_with_tokens.withColumn("shard_id", hash_bucket(id_col, n_shards))
        shard_col = "shard_id"
    else:
        work = docs_with_tokens
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(tokens_col_name).over(w)
    return work.select(
        id_col,
        F.col(tokens_col_name).cast("bigint").alias("n_tokens"),
        F.col(shard_col).alias("shard_id"),
        ((cum - F.col(tokens_col_name)) / budget).cast("bigint").alias("bin_id"),
    )


def pack_first_fit(
    docs_with_tokens: DataFrame,
    id_col: str = "doc_id",
    tokens_col_name: str = "n_tokens",
    budget: int = 2048,
    n_groups: int = 8,
) -> DataFrame:
    """Greedy first-fit-decreasing within hash-bucketed packing groups.

    Returns (id, n_tokens, group_id, bin_id); (group_id, bin_id) names a
    training sequence. Bins never exceed ``budget`` unless a single doc
    does (it then sits alone in its bin)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([tokens_col_name, id_col], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        for t in pdf[tokens_col_name]:
            for i, cap in enumerate(bins):
                if t <= cap:
                    bins[i] = cap - t
                    assigned.append(i)
                    break
            else:
                bins.append(max(budget - t, 0))
                assigned.append(len(bins) - 1)
        pdf = pdf.assign(bin_id=assigned)
        return pdf[[id_col, tokens_col_name, "group_id", "bin_id"]]

    tagged = docs_with_tokens.select(
        id_col,
        F.col(tokens_col_name).cast("bigint").alias(tokens_col_name),
        hash_bucket(id_col, n_groups).alias("group_id"),
    )
    schema = f"{id_col} bigint, {tokens_col_name} bigint, group_id bigint, bin_id bigint"
    return tagged.groupBy("group_id").applyInPandas(pack, schema=schema)
