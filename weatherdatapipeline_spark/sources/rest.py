"""REST ingestion source (reference extract.py:4-22, operators S1/S2).

The reference fetches ~54 cities with sequential blocking HTTP on one
process. Here the fetcher is an injected callable (no hard dependency on a
network or API key — SURVEY.md §7.4), and the parse is declarative:
``from_json`` with the declared StructType, nested-path projection P1.

Per-city failure tolerance (reference extract.py:19-20): a payload that
fails to parse becomes a NULL struct and is dropped, not a crashed batch.

Scale: a REST API is a driver-side boundary by nature (rate-limited,
small). The fetch returns raw JSON strings; everything after — parse,
flatten, type — is a distributed plan. For a truly large source list the
fetch itself can be distributed with mapInPandas over a table of URLs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import WEATHER_SOURCE_JSON

Fetcher = Callable[[str], str | None]
"""city -> raw JSON payload (or None on failure). Injected; tests use a
canned-payload fetcher, production wires an HTTP client here."""


def fetch_raw(spark: SparkSession, cities: Iterable[str], fetcher: Fetcher) -> DataFrame:
    """Driver-side fetch loop → DataFrame[city, payload]. Failures yield
    NULL payloads (skip-and-log semantics, extract.py:19-20)."""
    rows = []
    for city in cities:
        try:
            rows.append((city, fetcher(city)))
        except Exception:  # noqa: BLE001 — per-city tolerance, batch survives
            rows.append((city, None))
    return spark.createDataFrame(rows, "requested_city string, payload string")


def parse_observations(raw: DataFrame) -> DataFrame:
    """S2 + P1: JSON decode with declared schema, then the reference's
    10-column nested-path flatten (transform.py:9-18) as one projection."""
    j = F.from_json("payload", WEATHER_SOURCE_JSON)
    # PERMISSIVE parse yields an all-null struct for corrupt payloads — the
    # required `name` field being null IS the malformed-row signal
    parsed = raw.select("requested_city", j.alias("j")).filter(F.col("j.name").isNotNull())
    return parsed.select(
        F.col("j.name").alias("city"),
        F.col("j.sys.country").alias("country"),
        F.col("j.main.temp").alias("temperature"),
        F.col("j.main.feels_like").alias("feels_like"),
        F.col("j.main.humidity").alias("humidity"),
        F.col("j.main.pressure").alias("pressure"),
        F.col("j.weather").getItem(0).getField("main").alias("weather"),
        F.col("j.weather").getItem(0).getField("description").alias("description"),
        F.col("j.wind.speed").alias("wind_speed"),
        F.col("j.dt").alias("timestamp"),
    )


def ingest(spark: SparkSession, cities: Iterable[str], fetcher: Fetcher) -> DataFrame:
    """E-path: fetch → parse → flat observations (SURVEY.md §3.1)."""
    return parse_observations(fetch_raw(spark, cities, fetcher))
