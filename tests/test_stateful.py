from __future__ import annotations

from weatherdatapipeline_spark.operators.stateful import ewma, zscore_anomalies


def test_ewma_recurrence_exact(spark):
    # hand-computed: alpha=0.5, adjust=False → y = [10, 15, 17.5, 8.75+...]
    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("b", 1, 4.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {(r["k"], r["t"]): r["ewma"] for r in ewma(df, "k", "t", "v", alpha=0.5).collect()}
    assert got[("a", 1)] == 10.0
    assert got[("a", 2)] == 15.0  # 0.5*20 + 0.5*10
    assert got[("a", 3)] == 17.5  # 0.5*20 + 0.5*15
    assert got[("b", 1)] == 4.0  # independent key state


def test_zscore_anomalies_flags_planted_spike(spark):
    rows = [("a", t, 10.0 + (t % 3) * 0.1) for t in range(20)]
    rows.append(("a", 20, 500.0))  # planted spike
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = zscore_anomalies(df, "k", "t", "v", alpha=0.3, threshold=3.0).collect()
    assert any(r["t"] == 20 and r["deviation"] > 3.0 for r in out)
    assert all(r["t"] == 20 or r["deviation"] > 3.0 for r in out)  # steady rows not flagged