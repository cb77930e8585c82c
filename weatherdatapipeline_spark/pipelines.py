"""Composed pipelines: the multi-operator flows a user runs end-to-end.

``prepare_training_corpus`` is the canonical pretraining data-prep chain,
expressed as a handful of DataFrame plans over the §2.11 operators:

  quality/language gate → near-dup clustering → canonical-doc dedup →
  deterministic split → token-window chunking → sequence packing →
  partitioned parquet corpus + one stats row

Every stage is the already-tested operator (text.py, dedup.py,
sampling.py, chunking.py) — this module only composes and writes. At
100 TB each arrow is the scale path documented in SCALE.md: the gates are
map-only, clustering runs on the pair set (not the corpus), the split adds
zero shuffles, chunking is scan-throughput, and the one materialization
point (the cleaned corpus before chunking) bounds recomputation of the
shared prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import chunking as C
from .operators import dedup as D
from .operators import sampling as SA
from .operators import text as T


def prepare_training_corpus(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    min_quality: float = 0.55,
    jaccard_threshold: float = 0.2,
    split_fractions: dict[str, float] | None = None,
    chunk_window: int = 50,
    chunk_stride: int = 40,
    pack_budget: int = 2048,
) -> DataFrame:
    """Run the full prep chain; write chunks partitioned by split to
    ``out_dir`` and return a one-row stats DataFrame."""
    fractions = split_fractions or {"train": 0.8, "val": 0.1, "test": 0.1}

    # 1. quality gate (map-only single scan)
    gated = documents.filter(T.quality_score(F.col("text")) >= min_quality)

    # 2. near-dup clustering on the gated set; keep canonical docs. The
    # df-cut defaults on (corpus-scaled max_shingle_freq); log_cut reports
    # how many (doc, shingle) rows boilerplate shingles contributed.
    pairs = D.jaccard_near_duplicates(
        gated, threshold=jaccard_threshold, log_cut=True
    )
    cleaned = D.dedup_keep_canonical(gated, pairs)

    # 3. deterministic split (adds a column, no shuffle) — materialize
    # here: every downstream branch (chunks, packs, stats) shares this
    # prefix, and localCheckpoint stops each branch re-running the
    # clustering joins.
    corpus = SA.split_assign(cleaned, "doc_id", fractions).localCheckpoint()

    # 4. chunk + pack
    chunks = C.chunk_documents(corpus, window=chunk_window, stride=chunk_stride)
    chunks = chunks.join(corpus.select("doc_id", "split"), "doc_id")
    packed = C.pack_contiguous(
        corpus.select(
            "doc_id", F.size(C.tokens_col("text")).cast("bigint").alias("n_tokens")
        ),
        budget=pack_budget,
    )

    # 5. write the chunk corpus partitioned by split (split is the read
    # pattern: training readers scan train/ only — partition pruning)
    chunks.write.mode("overwrite").partitionBy("split").parquet(out_dir)

    stats = (
        corpus.groupBy()
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
        )
        .crossJoin(chunks.agg(F.count("*").alias("n_chunks")))
        .crossJoin(
            packed.agg(
                F.countDistinct("shard_id", "bin_id").alias("n_sequences")
            )
        )
        .withColumn("kept_ratio", F.lit(None).cast("double"))
    )
    n_in = documents.count()
    return stats.withColumn(
        "kept_ratio", (F.col("n_docs") / F.lit(n_in)).cast("double")
    )
