"""Tests for association rules, Poisson bootstrap, CUSUM change-point,
and burst detection."""

from __future__ import annotations

import datetime as dt

from weatherdatapipeline_spark.operators import mining as MI
from weatherdatapipeline_spark.operators import stats as ST
from weatherdatapipeline_spark.operators import timeseries as TS

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(i, ts, uid, etype, value=1.0):
    return (i, ts, uid, etype, value, "{}")


def test_association_rules_hand_computed(spark):
    # baskets: u1={a,b}, u2={a,b}, u3={a}, u4={b,c}
    t = dt.datetime(2024, 1, 1)
    rows = [
        _ev(1, t, 1, "a"), _ev(2, t, 1, "b"),
        _ev(3, t, 2, "a"), _ev(4, t, 2, "b"), _ev(5, t, 2, "b"),  # dup item
        _ev(6, t, 3, "a"),
        _ev(7, t, 4, "b"), _ev(8, t, 4, "c"),
    ]
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in MI.association_rules(ev, min_support=0.01).collect()
    }
    # n=4 baskets; n_a=3, n_b=3, n_c=1, n_ab=2, n_bc=1
    ab = got[("a", "b")]
    assert ab["n_baskets_both"] == 2
    assert abs(ab["support"] - 0.5) < 1e-9
    assert abs(ab["confidence"] - 2 / 3) < 1e-6
    assert abs(ab["lift"] - 2 * 4 / 9) < 1e-6
    # direction matters: confidence(c->b) = 1.0, confidence(b->c) = 1/3
    assert abs(got[("c", "b")]["confidence"] - 1.0) < 1e-9
    assert abs(got[("b", "c")]["confidence"] - 1 / 3) < 1e-6
    # lift symmetric
    assert got[("a", "b")]["lift"] == got[("b", "a")]["lift"]


def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [_ev(i, t, i, "x", float(i % 10)) for i in range(500)]
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    out1 = ST.poisson_bootstrap_ci(ev, n_reps=50).collect()
    out2 = ST.poisson_bootstrap_ci(ev, n_reps=50).collect()
    assert out1 == out2  # no RNG anywhere
    r = out1[0]
    assert r["n_reps"] == 50
    true_mean = sum(i % 10 for i in range(500)) / 500
    assert r["ci_lo"] <= r["boot_mean"] <= r["ci_hi"]
    assert r["ci_lo"] <= true_mean <= r["ci_hi"]
    # CI width for mean of ~uniform(0..9) at n=500 is well under +-1
    assert r["ci_hi"] - r["ci_lo"] < 1.0


def test_cusum_finds_planted_level_shift(spark):
    rows = []
    i = 0
    # 10 days at level 10, then 10 days at level 50 -> |cusum| peaks at
    # the last low day (day 10)
    for d in range(20):
        level = 10.0 if d < 10 else 50.0
        for h in (1, 13):
            rows.append(_ev(i, dt.datetime(2024, 1, 1 + d, h), 1, "x", level))
            i += 1
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    r = TS.cusum_changepoint(ev).collect()[0]
    assert r["n_days"] == 20
    assert r["change_day"] == "2024-01-10"
    # peak |cusum| = 10 days * |10 - 30| = 200
    assert abs(r["max_abs_cusum"] - 200.0) < 1e-6


def test_burst_ratio_flags_planted_spike(spark):
    rows = []
    i = 0
    base_day = dt.datetime(2024, 3, 1)
    # 30 hourly buckets at 4 events; bucket 28 gets 20 events (5x burst)
    for h in range(30):
        n = 20 if h == 28 else 4
        for k in range(n):
            rows.append(
                _ev(i, base_day + dt.timedelta(hours=h, minutes=k % 60), 1, "x")
            )
            i += 1
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = {r["bucket_s"]: r for r in TS.burst_ratios(ev).collect()}
    # first 6 buckets are cold-start (min_history) and emit nothing
    first = int(base_day.replace(tzinfo=dt.timezone.utc).timestamp())
    assert first not in out and first + 5 * 3600 not in out
    spike = out[first + 28 * 3600]
    assert spike["n_events"] == 20
    assert abs(spike["baseline"] - 4.0) < 1e-9
    assert abs(spike["burst_ratio"] - 5.0) < 1e-9
    # a steady bucket sits at ratio ~1
    assert abs(out[first + 20 * 3600]["burst_ratio"] - 1.0) < 1e-9


def test_poisson_bootstrap_ci_accepts_any_n_reps(spark):
    """ADVICE r10: the multiple-of-5 hash-lane budgeting must not leak
    into the API. Any replicate count works, and replicate weights nest:
    rep r draws the same weight regardless of n_reps, so n_reps=7 is
    exactly the first 7 replicates of n_reps=10."""
    t = dt.datetime(2024, 1, 1)
    rows = [_ev(i, t, i, "x", float(i % 10)) for i in range(100)]
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)
    out7 = ST.poisson_bootstrap_ci(ev, n_reps=7).collect()
    assert out7[0]["n_reps"] == 7
    out5 = ST.poisson_bootstrap_ci(ev, n_reps=5).collect()
    out3 = ST.poisson_bootstrap_ci(ev, n_reps=3).collect()
    assert out5[0]["n_reps"] == 5 and out3[0]["n_reps"] == 3
    # nesting: truncating replicates can only move the percentile CI
    # within the n_reps=7 replicate range, and all runs are deterministic
    assert out3[0]["ci_lo"] >= min(out7[0]["ci_lo"], out5[0]["ci_lo"]) - 1.0
