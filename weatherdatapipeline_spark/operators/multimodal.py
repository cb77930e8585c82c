"""Multimodal columns (SURVEY.md §2.11): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Pandas
iterators (``mapInPandas``).

What is REAL here (and tested): the schema contract, the synthetic blob
source, the mapInPandas plumbing (batch iteration, output schema, column
passthrough), partition sizing guidance. What is STUBBED: the actual
codec work — this container has no image/audio libraries, so decode
produces a deterministic fake feature vector and ``decode_image_strict``
raises NotImplementedError where PIL/libvips would be called.

Scale notes
-----------
- Blobs ride in the row (parquet binary) only up to ~1 MB; beyond that the
  column should hold a reference (path/offset into an object store) and
  the UDF fetches — the schema supports both via ``uri``.
- ``mapInPandas`` keeps the transfer Arrow-batched; batch size is bounded
  by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  is blob_size × batch, not partition size.
- Feature extraction is embarrassingly parallel: no shuffle anywhere in
  this module; repartition upstream only to balance blob-size skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("uri", StringType(), True),  # external ref when blob absent
        StructField("blob", BinaryType(), True),  # inline payload (small media)
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: blob = repeated hash bytes, metadata
    consistent with the modality. Exercises the binary column path without
    any codec."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.concat(F.lit("synthetic://media/"), F.col("id")).alias("uri"),
        F.sha2(F.concat(F.lit(seed), F.col("id")), 256).cast("binary").alias("blob"),
        (32 + F.pmod(F.xxhash64("id", F.lit("w")), F.lit(96))).cast("int").alias("width"),
        (32 + F.pmod(F.xxhash64("id", F.lit("h")), F.lit(96))).cast("int").alias("height"),
        (1000 + F.pmod(F.xxhash64("id", F.lit("d")), F.lit(9000))).cast("int").alias("duration_ms"),
        F.lit("synthetic").alias("format"),
    )
    return base.withColumn(
        "width", F.when(F.col("modality") == "audio", F.lit(None)).otherwise(F.col("width"))
    ).withColumn(
        "height", F.when(F.col("modality") == "audio", F.lit(None)).otherwise(F.col("height"))
    ).withColumn(
        "duration_ms",
        F.when(F.col("modality") == "image", F.lit(None)).otherwise(F.col("duration_ms")),
    )


def decode_image_strict(blob: bytes) -> object:
    """Where a real deployment calls PIL/libvips. STUB: this container has
    no imaging libraries."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/libvips) not present "
        "in this environment; wire it here"
    )


def _fake_feature(blob: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a codec+model feature extractor: fold the
    bytes into `dim` floats. Pure function of the blob — stable for tests."""
    if blob is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(blob):
        acc[i % dim] = (acc[i % dim] * 31 + byte) % 100_003
    return [v / 100_003.0 for v in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs via mapInPandas.

    The iterator shape (pdf-in → pdf-out) is exactly what a real decoder
    uses; only ``_fake_feature`` would change.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["blob"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["blob"].map(lambda b: _fake_feature(b, dim)),
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (the decode itself is the stub). Demonstrates the
    one-to-many explode shape a real frame sampler produces."""
    video = media.filter(F.col("modality") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
        F.col("uri"),
    )
