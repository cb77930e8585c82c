"""Declared schemas — schema-on-write at every boundary.

The reference infers schema everywhere and repairs types defensively and
repeatedly (reference ``transform.py:22``, ``training.py:154-157``,
``predict.py:78-87``; SURVEY.md §1.3). Here every table has one declared
StructType and coercion happens once, at ingest.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Flat weather observation — the reference's core record
# (reference transform.py:8-19; CSV header data/weather_data_*.csv).
WEATHER_RAW = StructType(
    [
        StructField("city", StringType(), False),
        StructField("country", StringType(), True),
        StructField("temperature", DoubleType(), True),
        StructField("feels_like", DoubleType(), True),
        StructField("humidity", IntegerType(), True),
        StructField("pressure", IntegerType(), True),
        StructField("weather", StringType(), True),
        StructField("description", StringType(), True),
        StructField("wind_speed", DoubleType(), True),
        # raw unix seconds as emitted by the source; coerced to TimestampType
        # by ingest (features F1: timestamp_seconds)
        StructField("timestamp", LongType(), True),
    ]
)

# The nested source JSON shape (OpenWeather response) that WEATHER_RAW is
# flattened from (reference extract.py:17 / transform.py:9-18). Declared so
# from_json parses with a contract instead of inference.
WEATHER_SOURCE_JSON = StructType(
    [
        StructField("name", StringType()),
        StructField(
            "main",
            StructType(
                [
                    StructField("temp", DoubleType()),
                    StructField("feels_like", DoubleType()),
                    StructField("humidity", IntegerType()),
                    StructField("pressure", IntegerType()),
                ]
            ),
        ),
        StructField(
            "weather",
            ArrayType(
                StructType(
                    [
                        StructField("main", StringType()),
                        StructField("description", StringType()),
                    ]
                )
            ),
        ),
        StructField("wind", StructType([StructField("speed", DoubleType())])),
        StructField("sys", StructType([StructField("country", StringType())])),
        StructField("dt", LongType()),
    ]
)

# Post-load record shape: WEATHER_RAW + load-time metadata
# (reference load.py:31-32, :57-58).
WEATHER_ENRICHED = StructType(
    WEATHER_RAW.fields
    + [
        StructField("event_time", TimestampType(), True),
        StructField("inserted_at", TimestampType(), False),
        StructField("batch_id", StringType(), False),
        StructField("is_current", BooleanType(), True),
    ]
)

# Per-batch aggregate summary (reference load.py:93-113; FIXTURES.md A3).
WEATHER_STATISTICS = StructType(
    [
        StructField("batch_id", StringType(), False),
        StructField("stat_time", TimestampType(), False),
        StructField("total_records", LongType(), False),
        StructField("cities_count", LongType(), False),
        StructField("avg_temperature", DoubleType(), True),
        StructField("max_temperature", DoubleType(), True),
        StructField("min_temperature", DoubleType(), True),
        StructField("avg_humidity", DoubleType(), True),
        StructField("cities", ArrayType(StringType()), True),
        StructField(
            "temperature_distribution",
            StructType(
                [
                    StructField("very_cold", LongType()),
                    StructField("cold", LongType()),
                    StructField("cool", LongType()),
                    StructField("moderate", LongType()),
                    StructField("warm", LongType()),
                    StructField("hot", LongType()),
                ]
            ),
            True,
        ),
    ]
)

# Scored rows (reference main.py:132-141, predict.py:112-115; FIXTURES.md A4).
PREDICTIONS = StructType(
    WEATHER_RAW.fields
    + [
        StructField("pred_temperature", DoubleType(), True),
        StructField("pred_condition", StringType(), True),
        StructField("pred_type", StringType(), False),
        StructField("inserted_at", TimestampType(), False),
    ]
)
