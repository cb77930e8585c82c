"""Batch summary statistics — the reference's flagship artifact.

Reference ``load.py:93-113`` computes a per-batch stats document with 10+
separate eager pandas passes over the frame (count, nunique, mean, max,
min, value_counts, 6 band counts). Here the whole document is ONE
``agg(...)`` — a single scan, map-side partial aggregation, one shuffle of
pre-combined state (SURVEY.md A1-A9).

At 100 TB this is the difference between 10 full-data passes and one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import banded_histogram

# The reference's temperature bands (load.py:105-112).
TEMPERATURE_BANDS: list[tuple[str, float | None, float | None]] = [
    ("very_cold", None, 0.0),
    ("cold", 0.0, 10.0),
    ("cool", 10.0, 20.0),
    ("moderate", 20.0, 30.0),
    ("warm", 30.0, 40.0),
    ("hot", 40.0, None),
]


def batch_statistics(
    weather: DataFrame,
    group_by: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """A1-A9 in one aggregate.

    ``group_by=None`` reproduces the reference exactly (one summary row per
    batch — callers group by batch_id). ``exact_distinct=False`` swaps
    ``countDistinct`` for ``approx_count_distinct`` (HLL): at 100 TB an
    exact distinct on a high-cardinality key is its own extra shuffle; the
    sketch is mergeable map-side.
    """
    distinct_cities = (
        F.countDistinct("city") if exact_distinct else F.approx_count_distinct("city")
    )
    aggs = [
        F.count(F.lit(1)).alias("total_records"),  # A1
        distinct_cities.alias("cities_count"),  # A2
        F.avg("temperature").alias("avg_temperature"),  # A3
        F.max("temperature").alias("max_temperature"),  # A4
        F.min("temperature").alias("min_temperature"),  # A4
        F.avg("humidity").alias("avg_humidity"),  # A3
        F.sort_array(F.collect_set("city")).alias("cities"),  # A5
        *banded_histogram(weather, "temperature", TEMPERATURE_BANDS),  # A8
    ]
    grouped = weather.groupBy(*group_by) if group_by else weather.groupBy()
    out = grouped.agg(*aggs)
    # A8 bands folded into the reference's nested shape (FIXTURES.md A3)
    band_names = [b[0] for b in TEMPERATURE_BANDS]
    return out.withColumn(
        "temperature_distribution", F.struct(*[F.col(b) for b in band_names])
    ).drop(*band_names)


def condition_histogram(weather: DataFrame, group_by: list[str] | None = None) -> DataFrame:
    """A6 `weather_conditions` value-counts (reference ``load.py:103``) as a
    map column, built relationally: groupBy + map_from_entries."""
    keys = group_by or []
    counted = weather.groupBy(*keys, "weather").agg(F.count(F.lit(1)).alias("cnt"))
    collected = counted.groupBy(*keys).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("weather", "cnt")))
        ).alias("weather_conditions")
    )
    return collected
