"""Loader-contract tests: queries._t must load events.parquet in BOTH
physical layouts the driver's testdata has shipped — legacy TIMESTAMP(NANOS)
(readable only as raw int64 via spark.sql.legacy.parquet.nanosAsLong) and
native timestamp[us] — and produce identical timestamp semantics for either.

Round-4 postmortem: the testdata regenerated events.parquet with a us ts
column and the unconditional nanos workaround broke 11 driver queries, the
bench, and 6 tests at once. These fixtures pin the contract so future drift
fails here first, with a clear message, instead of in every downstream query.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from weatherdatapipeline_spark.queries import _t

ROWS = [
    # (event_id, epoch_micros, user_id, event_type, value, props)
    (1, 1704067200_000_000, 10, "click", 1.5, '{"k": 1}'),
    (2, 1704067260_500_000, 10, "view", 2.0, "{}"),
    (3, 1704153599_999_999, 11, "click", 0.25, None),
]


def _write_events(path: str, ts_unit: str) -> None:
    if ts_unit == "ns":
        ts_arr = pa.array([m * 1000 for _, m, *_ in ROWS], type=pa.timestamp("ns"))
    else:
        ts_arr = pa.array([m for _, m, *_ in ROWS], type=pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r[2] for r in ROWS], type=pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], type=pa.string()),
            "value": pa.array([r[4] for r in ROWS], type=pa.float64()),
            "props": pa.array([r[5] for r in ROWS], type=pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("ts_unit", ["ns", "us"])
def test_events_loads_both_ts_layouts(spark, tmp_path, ts_unit):
    d = tmp_path / ts_unit
    d.mkdir()
    _write_events(str(d / "events.parquet"), ts_unit)
    df = _t(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["event_id"]: r for r in df.collect()}
    assert len(got) == len(ROWS)
    for event_id, micros, *_ in ROWS:
        expect = datetime.datetime.fromtimestamp(micros / 1e6, tz=datetime.timezone.utc)
        # session tz is pinned UTC inside _t; collect() returns naive local
        assert got[event_id]["ts"].replace(tzinfo=datetime.timezone.utc) == expect


def test_events_ts_semantics_identical_across_layouts(spark, tmp_path):
    """hour()/unix_micros()/date_format() — the exact downstream surfaces the
    oracle hashes depend on — must agree between the two physical layouts."""
    from pyspark.sql import functions as F

    outs = []
    for unit in ("ns", "us"):
        d = tmp_path / f"sem_{unit}"
        d.mkdir()
        _write_events(str(d / "events.parquet"), unit)
        df = _t(spark, str(d), "events").select(
            "event_id",
            F.unix_micros("ts").alias("um"),
            F.hour("ts").alias("h"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s"),
        )
        outs.append(sorted(tuple(r) for r in df.collect()))
    assert outs[0] == outs[1]
