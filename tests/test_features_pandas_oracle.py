"""Feature-plan parity tests — the oracle is pandas itself (SURVEY.md §5.2):
an independent pandas computation of the same contract (lags, rolling with
min_periods, calendar, drop_first one-hot, validity filter) is compared
cell-by-cell against the Spark plan on a fixture with the FIXTURES.md A1
edge rows (cities with 1/2/3 observations, NULL boundaries, midnight/week
crossings)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from weatherdatapipeline_spark.operators.features import (
    align_features,
    discover_categories,
    engineer_features,
    ensure_event_time,
)

BASE_TS = 1_700_000_000  # 2023-11-14 22:13:20 UTC — crosses midnight at +6420s


def fixture_rows():
    """Cities with 8, 3, 2, 1 observations; 5-min cadence; values chosen to
    exercise every band and NULL boundary."""
    rows = []
    series = {
        "Alpha": 8,
        "Beta": 3,
        "Gamma": 2,
        "Delta": 1,
    }
    i = 0
    for city, n in series.items():
        for k in range(n):
            rows.append(
                {
                    "city": city,
                    "country": {"Alpha": "AA", "Beta": "BB", "Gamma": "GG", "Delta": "DD"}[city],
                    "temperature": round(-5.0 + 7.3 * ((i * 13) % 9), 2),
                    "feels_like": round(1.0 + 0.5 * i, 2),
                    "humidity": 40 + (i * 7) % 50,
                    "pressure": 1000 + (i * 3) % 20,
                    "weather": ["Clear", "Rain", "Clouds"][i % 3],
                    "description": "x",
                    "wind_speed": round(1.0 + 0.25 * i, 2),
                    "timestamp": BASE_TS + k * 300 + {"Alpha": 0, "Beta": 7, "Gamma": 11, "Delta": 13}[city],
                }
            )
            i += 1
    return rows


def pandas_oracle(pdf: pd.DataFrame):
    """Independent pandas computation of the feature contract."""
    out = pdf.copy()
    out["timestamp"] = pd.to_datetime(out["timestamp"], unit="s")
    out = out.sort_values(["city", "timestamp"]).reset_index(drop=True)
    out["hour"] = out["timestamp"].dt.hour
    out["dayofweek"] = out["timestamp"].dt.dayofweek
    g = out.groupby("city", group_keys=False)
    for k in (1, 3):
        out[f"temp_lag_{k}"] = g["temperature"].shift(k)
        out[f"humidity_lag_{k}"] = g["humidity"].shift(k)
        out[f"wind_lag_{k}"] = g["wind_speed"].shift(k)
        out[f"pressure_lag_{k}"] = g["pressure"].shift(k)
    out["temp_rollmean_3"] = g["temperature"].rolling(3).mean().reset_index(level=0, drop=True)
    out["temp_rollstd_3"] = g["temperature"].rolling(3).std().reset_index(level=0, drop=True)
    out["humidity_rollmean_3"] = g["humidity"].rolling(3).mean().reset_index(level=0, drop=True)
    out["target_temp_next"] = g["temperature"].shift(-1)
    out["target_condition"] = out["weather"]
    dummies = pd.get_dummies(
        out[["city", "country", "hour", "dayofweek"]].astype({"city": str, "country": str}),
        columns=["city", "country", "hour", "dayofweek"],
        drop_first=True,
        dtype=bool,
    )
    return pd.concat([out, dummies], axis=1)


@pytest.fixture(scope="module")
def frames(spark):
    rows = fixture_rows()
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    feat, cols = engineer_features(sdf, inference=True)
    got = feat.toPandas().sort_values(["city", "timestamp"]).reset_index(drop=True)
    want = pandas_oracle(pd.DataFrame(rows))
    return got, want, cols


def test_row_alignment(frames):
    got, want, _ = frames
    assert len(got) == len(want)
    assert list(got["city"]) == list(want["city"])


@pytest.mark.parametrize(
    "col",
    [
        "temp_lag_1",
        "temp_lag_3",
        "humidity_lag_1",
        "humidity_lag_3",
        "wind_lag_1",
        "wind_lag_3",
        "pressure_lag_1",
        "pressure_lag_3",
        "temp_rollmean_3",
        "temp_rollstd_3",
        "humidity_rollmean_3",
        "target_temp_next",
    ],
)
def test_numeric_feature_parity(frames, col):
    got, want, _ = frames
    for i, (g, w) in enumerate(zip(got[col], want[col])):
        g_nan = g is None or (isinstance(g, float) and math.isnan(g))
        w_nan = w is None or (isinstance(w, float) and math.isnan(w))
        assert g_nan == w_nan, f"{col}[{i}]: null mismatch spark={g} pandas={w}"
        if not g_nan:
            assert abs(g - w) < 1e-9, f"{col}[{i}]: {g} != {w}"


def test_onehot_drop_first_parity(frames):
    got, want, cols = frames
    spark_onehots = sorted(c for c in cols if c.split("_")[0] in ("city", "country", "hour", "dayofweek"))
    pandas_onehots = sorted(
        c
        for c in want.columns
        if c.startswith(("city_", "country_", "hour_", "dayofweek_"))
    )
    assert spark_onehots == pandas_onehots
    for c in spark_onehots:
        assert list(got[c].astype(bool)) == list(want[c].astype(bool)), c


def test_calendar_convention(frames):
    got, want, _ = frames
    assert list(got["target_condition"]) == list(want["target_condition"])
    # hour/dayofweek checked through the one-hot columns; verify underlying too
    # by reconstructing from the one-hot (drop_first makes first level implicit)


def test_training_mode_filters_nulls(spark):
    rows = fixture_rows()
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    feat, cols = engineer_features(sdf, inference=False)
    pdf = feat.toPandas()
    assert len(pdf) > 0
    assert not pdf[cols + ["target_temp_next", "target_condition"]].isna().any().any()
    # only Alpha (8 obs) has rows surviving lag-3 + rolling-3 + lead-1
    assert set(pdf["city"]) == {"Alpha"}
    assert len(pdf) == 8 - 3 - 1  # first 3 lag-null rows and last lead-null row


def test_ensure_event_time_coerces_bad_values(spark):
    df = spark.createDataFrame(
        [("a", "1700000000"), ("b", "not-a-number")], "city string, timestamp string"
    )
    out = ensure_event_time(df).collect()
    vals = {r["city"]: r["timestamp"] for r in out}
    assert vals["a"] is not None
    assert vals["b"] is None  # errors='coerce' parity via try_cast


def test_align_features_patches_schema(spark):
    df = spark.createDataFrame([(1.0, True)], "temperature double, city_Berlin boolean")
    out = align_features(df, ["temperature", "city_Berlin", "city_Tokyo", "wind_speed"])
    row = out.collect()[0]
    assert row["city_Tokyo"] is False  # missing one-hot -> False
    assert row["wind_speed"] == 0.0  # missing numeric -> 0.0
    assert out.columns[-4:] == ["temperature", "city_Berlin", "city_Tokyo", "wind_speed"]


def test_discover_categories_sorted(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",), ("a",)], "city string")
    assert discover_categories(df, ["city"]) == {"city": ["a", "b", "c"]}
