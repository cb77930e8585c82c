"""Embedding-column utilities (SURVEY.md §2.11 adjuncts): L2
normalization and int8 quantization over ``array<float>`` columns.

Both are pure JVM array expressions (``transform`` / ``aggregate`` — no
Python, no UDFs, map-only): at 100 TB they run at scan throughput inside
whole-stage codegen and add zero shuffles. Quantization is the standard
storage/serving trade for large embedding corpora — 4x smaller vectors
(int8 vs float32) at ~1% cosine error — and per-vector symmetric scaling
(``scale = max|x| / 127``) keeps dequantization a one-multiply map.

Normalization matters upstream of every cosine path in
``operators/similarity.py``: unit-norm vectors turn cosine into a plain
dot product, which halves the per-pair arithmetic of brute-force top-k
and makes LSH hyperplane signs exact rather than norm-biased.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INT8_MAX = 127


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of an array column, folded in DOUBLE."""
    return F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(vec: Column, eps: float = 1e-12) -> Column:
    """Unit-normalize an array column; an all-zero vector stays zero
    (norm clamped by ``eps``) rather than dividing by zero to NULL/NaN."""
    n = F.greatest(l2_norm(vec), F.lit(float(eps)))
    return F.transform(vec, lambda x: x.cast("double") / n)


def quantization_scale(vec: Column) -> Column:
    """Per-vector symmetric int8 scale: ``max|x| / 127`` (0.0 for an
    all-zero vector, which then quantizes to all zeros)."""
    return (
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
        / F.lit(float(INT8_MAX))
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_vec_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: adds ``scale`` (double)
    and ``qvec`` (array<int> in [-127, 127]); original float vector is
    dropped. Map-only — no shuffle, no Python.

    Rounding is ``round`` half-up via SQL ROUND to keep the oracle
    (DuckDB ``round``) bit-identical; values are clamped defensively
    although ``|x| <= max|x|`` already bounds them.
    """
    scale = quantization_scale(F.col(vec_col))
    safe = F.greatest(scale, F.lit(1e-30))  # all-zero vector guard
    q = F.transform(
        F.col(vec_col),
        lambda x: F.least(
            F.lit(INT8_MAX),
            F.greatest(F.lit(-INT8_MAX), F.round(x.cast("double") / safe)),
        ).cast("int"),
    )
    # scale is emitted UNROUNDED: rounding belongs to display/oracle
    # layers — a tiny-magnitude vector (max|x| < ~6e-8) has scale < 5e-10,
    # which decimal rounding would zero, silently breaking dequantization
    return embeddings.select(
        F.col(id_col),
        scale.alias(scale_col),
        q.alias(out_vec_col),
    )


def dequantize_int8(
    quantized: DataFrame,
    vec_col: str = "qvec",
    scale_col: str = "scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse map: ``x ≈ q * scale`` (double array). Reconstruction
    error per component is bounded by ``scale / 2``."""
    return quantized.withColumn(
        out_col,
        F.transform(F.col(vec_col), lambda q: q.cast("double") * F.col(scale_col)),
    )
