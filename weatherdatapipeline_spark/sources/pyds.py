"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
the synthetic weather feed exposed as a REGISTERED SPARK SOURCE —
``spark.read.format("weather_synth")`` — instead of a builder function.

Why this exists alongside ``sources/synthetic.py`` (the expression-graph
generator): the Data Source API is the extension point a real deployment
uses to plug a paywalled/REST/proprietary feed into Spark's scan
planning. This module demonstrates the full contract on a deterministic
source so the behavior is testable:

- **partition planning**: ``partitions()`` splits the batch range into
  ``numPartitions`` input splits, so the scan parallelizes across
  executors like any file source — a 54-billion-row request plans into
  bounded splits, with no driver-side materialization.
- **per-partition generation**: ``read(partition)`` yields tuples for
  its split only; memory per task is one row at a time (generator).
- **determinism**: every value is a pure function of (seed, batch, city)
  via md5 — same options → identical rows at ANY partition count, the
  same partition-stability contract ``synthetic.py`` pins for xxhash64.
- **streaming**: ``simpleStreamReader()`` exposes the same rows as an
  offset-tracked stream (offset = next batch index). Each
  ``availableNow`` run drains the chunk prefetched at start and commits
  its end offset to the checkpoint — the Trigger.AvailableNow
  "incremental batch" pattern — and replayed offset ranges regenerate
  identical rows (pure function of seed), the exactly-once recovery
  contract.

The Python worker boundary costs Arrow serialization per row — for the
JVM-side twin the expression graph in synthetic.py remains the scale
path; this source is the INTEGRATION surface (the shape a C++/REST/
Kafka-bridge source would take), not a throughput claim.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .synthetic import CITIES, CONDITIONS, INTENSITY

SCHEMA = (
    "city string, country string, temperature double, feels_like double, "
    "humidity int, pressure int, weather string, description string, "
    "wind_speed double, timestamp long"
)


def _h(seed: int, sid: int, salt: str) -> int:
    """Deterministic 60-bit int from (seed, row id, salt) — hashlib.md5 is
    identical on every worker/platform, the portability xxhash64 has
    JVM-side and Python lacks without a dependency."""
    d = hashlib.md5(f"{seed}:{sid}:{salt}".encode()).hexdigest()
    return int(d[:15], 16)


def _u(seed: int, sid: int, salt: str, lo: float, hi: float) -> float:
    return lo + (_h(seed, sid, salt) % 1_000_000_000) / 1e9 * (hi - lo)


def _row(seed: int, sid: int, batch: int, ci: int, start_unix: int,
         interval_s: int) -> tuple:
    city, country = CITIES[ci]
    base = _u(seed, sid, "base", 15.0, 40.0)
    wx = CONDITIONS[_h(seed, sid, "wx") % len(CONDITIONS)]
    return (
        city,
        country,
        round(base + _u(seed, sid, "dt", -5.0, 5.0), 2),
        round(base + _u(seed, sid, "fl", -3.0, 7.0), 2),
        40 + _h(seed, sid, "hum") % 51,
        1000 + _h(seed, sid, "prs") % 21,
        wx,
        f"{INTENSITY[_h(seed, sid, 'in') % len(INTENSITY)]} {wx.lower()}",
        round(_u(seed, sid, "wind", 1.0, 15.0), 2),
        start_unix + batch * interval_s,
    )


class _Split(InputPartition):
    def __init__(self, start_batch: int, end_batch: int):
        self.start_batch = start_batch
        self.end_batch = end_batch


class WeatherSynthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_batches = int(options.get("n_batches", 10))
        self.seed = int(options.get("seed", 42))
        self.start_unix = int(options.get("start_unix", 1_700_000_000))
        self.interval_s = int(options.get("interval_s", 300))
        self.num_partitions = int(options.get("numPartitions", 4))

    def partitions(self) -> list[InputPartition]:
        n, p = self.n_batches, max(1, self.num_partitions)
        step = -(-n // p)  # ceil
        return [
            _Split(i, min(i + step, n)) for i in range(0, n, step)
        ]

    def read(self, partition: _Split) -> Iterator[tuple]:
        for batch in range(partition.start_batch, partition.end_batch):
            for ci in range(len(CITIES)):
                sid = batch * len(CITIES) + ci
                yield _row(self.seed, sid, batch, ci, self.start_unix,
                           self.interval_s)


class WeatherSynthStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"batch": next unread batch index}. Each micro-batch
    serves ``batches_per_trigger`` polls; replay between identical
    offsets regenerates identical rows (pure function of seed), which is
    what makes the source exactly-once under checkpoint recovery."""

    def __init__(self, options: dict):
        self.opts = options
        self.n_batches = int(options.get("n_batches", 10))
        self.seed = int(options.get("seed", 42))
        self.start_unix = int(options.get("start_unix", 1_700_000_000))
        self.interval_s = int(options.get("interval_s", 300))
        self.per_trigger = int(options.get("batches_per_trigger", 3))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        lo = int(start["batch"])
        hi = min(lo + self.per_trigger, self.n_batches)
        return self._rows(lo, hi), {"batch": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._rows(int(start["batch"]), int(end["batch"]))

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a LIST, not a generator: the simple-stream API ships the rows
        # from driver to executors by pickling them (that driver-side
        # buffering is the documented trade-off of the simple reader; a
        # partition-planned DataSourceStreamReader is the scale path)
        return [
            _row(self.seed, batch * len(CITIES) + ci, batch, ci,
                 self.start_unix, self.interval_s)
            for batch in range(lo, hi)
            for ci in range(len(CITIES))
        ]


class WeatherSynthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_synth"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> WeatherSynthReader:
        return WeatherSynthReader(self.options)

    def simpleStreamReader(self, schema) -> WeatherSynthStreamReader:
        return WeatherSynthStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this, ``format("weather_synth")``
    resolves for both batch reads and readStream."""
    spark.dataSource.register(WeatherSynthDataSource)
