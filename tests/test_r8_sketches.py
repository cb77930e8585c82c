"""Round-8 engine-surface additions: explicit HLL estimator quality and
native recursive CTE semantics (cross-engine exactness is pinned by the
oracle harness; these tests pin that the ALGORITHMS do what they claim)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _hll_estimate(spark, n_distinct: int) -> float:
    """Run the query's exact HLL pipeline over a planted id set."""
    from weatherdatapipeline_spark import queries as Q

    ids = spark.range(n_distinct).select(
        F.lit("t").alias("event_type"), F.col("id").alias("user_id")
    )
    hx = F.md5(F.col("user_id").cast("string"))
    j = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(hx, 3, 13), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(w)))
    per = (
        ids.select(j.alias("j"), rho.alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").alias("r"))
        .agg(
            F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("r")).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("present"),
        )
        .first()
    )
    v = Q._HLL_M - per["present"]
    e_raw = Q._HLL_NUM / float(per["s"] + v * 2**53)
    if e_raw <= 2.5 * Q._HLL_M and v > 0:
        import math

        return Q._HLL_M * math.log(Q._HLL_M / v)
    return e_raw


def test_hll_standard_error_bound_large(spark):
    # theoretical RSE = 1.04/sqrt(256) ~ 6.5%; allow 3 sigma
    est = _hll_estimate(spark, 20_000)
    assert abs(est - 20_000) / 20_000 < 0.20


def test_hll_small_range_correction_near_exact(spark):
    # 30 distinct << m: linear counting path engages and is tight
    est = _hll_estimate(spark, 30)
    assert abs(est - 30) / 30 < 0.15


def test_hll_monotone_in_cardinality(spark):
    assert _hll_estimate(spark, 500) < _hll_estimate(spark, 5_000) < _hll_estimate(
        spark, 50_000
    )


def test_recursive_cte_chain_semantics(spark, sf_dir):
    """Every user's ancestor chain halves down to 1 (or stops at 0):
    depth == floor(log2(uid)) for uid >= 1, chain_len == depth + 1, and
    chain_events over a planted single-user-per-node table telescopes."""
    from weatherdatapipeline_spark.queries import recursive_cte_ancestor_rollup

    out = {
        r["user_id"]: (r["depth"], r["chain_len"], r["chain_events"])
        for r in recursive_cte_ancestor_rollup(spark, sf_dir).collect()
    }
    for uid, (depth, chain_len, _) in out.items():
        if uid >= 1:
            assert depth == uid.bit_length() - 1
        else:
            assert depth == 0
        assert chain_len == depth + 1

    # telescoping on a planted table: uid 12 -> 6 -> 3 -> 1, counts 1 each
    rows = [(i, u) for i, u in enumerate([12, 6, 3, 1, 5])]
    spark.createDataFrame(rows, "event_id long, user_id long").createOrReplaceTempView(
        "v_events_rec"
    )
    got = {
        r["user_id"]: r["chain_events"]
        for r in spark.sql(
            """
            WITH RECURSIVE uc AS (
              SELECT user_id AS uid, count(*) AS c FROM v_events_rec GROUP BY user_id
            ),
            walk AS (
              SELECT uid AS u, uid AS node, 0 AS depth FROM uc
              UNION ALL
              SELECT u, node DIV 2, depth + 1 FROM walk WHERE node > 1
            )
            SELECT u AS user_id, CAST(sum(coalesce(c, 0)) AS BIGINT) AS chain_events
            FROM walk LEFT JOIN uc ON uc.uid = walk.node GROUP BY u
            """
        ).collect()
    }
    assert got[12] == 4  # 12,6,3,1 all present
    assert got[5] == 2   # 5 -> 2(absent) -> 1
    assert got[1] == 1


def test_cox_newton_matches_closed_form(spark):
    """One-covariate Cox MLE with a hand-solvable score equation:
    risk table {(d=1,d1=1,n1=2,n0=2), (d=1,d1=0,n1=1,n0=2)} gives
    u/(1+u) + u/(2+u) = 1 with u = e^beta  =>  u = sqrt(2),
    beta = ln(2)/2. Four Newton steps must land on it."""
    import math

    from weatherdatapipeline_spark.queries import _cox_newton_binary

    risk = spark.createDataFrame(
        [(1.0, 1.0, 2.0, 2.0), (1.0, 0.0, 1.0, 2.0)],
        "d double, d1 double, n1 double, n0 double",
    )
    beta = _cox_newton_binary(risk, steps=4)
    assert abs(beta - math.log(2) / 2) < 1e-8


def test_cox_newton_zero_effect_on_balanced_table(spark):
    """Perfectly balanced deaths/risk across arms => beta = 0 exactly
    (the score at 0 is already 0, Newton stays put)."""
    from weatherdatapipeline_spark.queries import _cox_newton_binary

    risk = spark.createDataFrame(
        [(2.0, 1.0, 5.0, 5.0), (2.0, 1.0, 3.0, 3.0)],
        "d double, d1 double, n1 double, n0 double",
    )
    assert _cox_newton_binary(risk, steps=4) == 0.0


def test_als_rank1_recovers_planted_factorization(spark):
    """Exactly rank-1 matrix r_ij = a_i * b_j: ALS must reconstruct it
    perfectly (u x v == r cellwise) after the first full round."""
    from weatherdatapipeline_spark.queries import _als_rank1

    a = {10: 1.0, 11: 2.0, 12: 0.5}
    b = {"x": 3.0, "y": 1.5, "z": 6.0}
    rows = [(ui, tj, av * bv) for ui, av in a.items() for tj, bv in b.items()]
    cells = spark.createDataFrame(rows, "user_id long, event_type string, r double")
    u, v = _als_rank1(cells, rounds=3)
    um = {r["user_id"]: r["u"] for r in u.collect()}
    vm = {r["event_type"]: r["v"] for r in v.collect()}
    for (ui, tj, r) in rows:
        assert abs(um[ui] * vm[tj] - r) < 1e-9
    # factors are the planted ones up to the shared scale ambiguity
    scale = um[10] / a[10]
    for ui, av in a.items():
        assert abs(um[ui] - av * scale) < 1e-9
    for tj, bv in b.items():
        assert abs(vm[tj] - bv / scale) < 1e-9
