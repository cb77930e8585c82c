"""Round-10 wave 2: semantic assertions for the classical-test battery
(Jarque-Bera, Durbin-Watson, Brown-Forsythe, Mann-Kendall). Oracle hash
parity is covered by tools/check_oracle.py; these pin the MATH against
closed forms and planted synthetic series the hashes can't see."""

from __future__ import annotations

import math

import pytest

from weatherdatapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from weatherdatapipeline_spark.session import get_spark

    return get_spark("r10-wave2-tests")


def _synthetic_events(spark, rows):
    """(ts_str, user_id, event_type, value) rows -> events-shaped df."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, ts, u, t, float(v), "{}") for i, (ts, u, t, v) in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    )
    return df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def _with_events(tmp_path, df):
    p = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(p + "/events.parquet")
    return p


def test_jarque_bera_matches_scalar_replay(spark):
    rows = {r["event_type"]: r for r in QUERIES["jarque_bera_normality"](spark, SF).collect()}
    assert rows
    # replay one group's moments in pure python at full precision
    import pyspark.sql.functions as F

    from weatherdatapipeline_spark.queries import _t

    ev = _t(spark, SF, "events").filter(F.col("event_type") == "click")
    vals = [r["value"] for r in ev.select("value").collect()]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((v - mu) ** 2 for v in vals) / n
    m3 = sum((v - mu) ** 3 for v in vals) / n
    m4 = sum((v - mu) ** 4 for v in vals) / n
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3.0
    jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    r = rows["click"]
    assert r["n"] == n
    # the query computes central moments from raw DECIMAL power sums; the
    # two formulations agree to well inside one quantization step
    assert abs(r["skew_q4"] - g1 * 1e4) <= 2
    assert abs(r["ex_kurt_q4"] - g2 * 1e4) <= 2
    assert abs(r["jb_q2"] - jb * 1e2) <= 2
    assert r["reject_5pct"] == int(jb > 5.991465)


def test_durbin_watson_planted_series(spark, tmp_path):
    # alternating +1/-1 residuals: e_t - e_{t-1} = +-2, so
    # DW = sum(4)*(n-1)/sum(1)*n -> 4*(n-1)/n ~ 4 (max negative autocorr);
    # a monotone ramp 1..n has DW -> ~0 side; iid should sit near 2.
    n = 64
    alt = [(f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", 1, "alt", 10 + (1 if i % 2 == 0 else -1)) for i in range(n)]
    sf = _with_events(tmp_path, _synthetic_events(spark, alt))
    r = {x["event_type"]: x for x in QUERIES["durbin_watson_by_type"](spark, sf).collect()}
    dw = r["alt"]["dw_q6"] / 1e6
    assert abs(dw - 4.0 * (n - 1) / n) < 1e-9
    assert r["alt"]["n"] == n


def test_durbin_watson_positive_autocorr_low(spark, tmp_path):
    # slow ramp: adjacent residuals nearly equal -> DW near 0
    n = 50
    ramp = [(f"2024-01-01 01:{i // 60:02d}:{i % 60:02d}", 1, "ramp", float(i)) for i in range(n)]
    sf = _with_events(tmp_path, _synthetic_events(spark, ramp))
    r = QUERIES["durbin_watson_by_type"](spark, sf).collect()[0]
    assert r["dw_q6"] / 1e6 < 0.05


def test_levene_equal_vs_unequal_variance(spark, tmp_path):
    # two groups with identical |deviation| pattern -> W == 0;
    # then one group scaled 5x -> W large
    base = [-2.0, -1.0, 0.0, 1.0, 2.0] * 8
    rows_eq = [
        (f"2024-01-01 02:{i // 60:02d}:{i % 60:02d}", 1, t, 100 + v)
        for t in ("a", "b")
        for i, v in enumerate(base)
    ]
    sf = _with_events(tmp_path, _synthetic_events(spark, rows_eq))
    r = QUERIES["levene_brown_forsythe"](spark, sf).collect()[0]
    assert r["k_groups"] == 2 and r["w_q6"] == 0
    assert r["df1"] == 1 and r["df2"] == r["n"] - 2

    rows_ne = [
        (f"2024-01-01 03:{i // 60:02d}:{i % 60:02d}", 1, t, 100 + v * (5 if t == "b" else 1))
        for t in ("a", "b")
        for i, v in enumerate(base)
    ]
    sf2 = _with_events(tmp_path / "ne", _synthetic_events(spark, rows_ne))
    r2 = QUERIES["levene_brown_forsythe"](spark, sf2).collect()[0]
    assert r2["w_q6"] > 10 * 1e6  # strongly rejected


def test_mann_kendall_monotone_and_flat(spark, tmp_path):
    # strictly increasing daily means -> S = n(n-1)/2 (every pair concordant)
    days = 12
    inc = [(f"2024-01-{d + 1:02d} 12:00:00", 1, "inc", float(d)) for d in range(days)]
    flat = [(f"2024-01-{d + 1:02d} 12:00:00", 1, "flat", 7.0) for d in range(days)]
    sf = _with_events(tmp_path, _synthetic_events(spark, inc + flat))
    r = {x["event_type"]: x for x in QUERIES["mann_kendall_trend"](spark, sf).collect()}
    n = days
    assert r["inc"]["s_stat"] == n * (n - 1) // 2
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    assert r["inc"]["var_s_q2"] == round(var_s * 100)
    assert abs(r["inc"]["z_q6"] / 1e6 - (r["inc"]["s_stat"] - 1) / math.sqrt(var_s)) < 1e-6
    # all-tied series: S = 0, z = 0, tie correction zeroes the variance
    assert r["flat"]["s_stat"] == 0 and r["flat"]["z_q6"] == 0
    assert r["flat"]["var_s_q2"] == 0


def test_kruskal_wallis_matches_pure_python(spark, tmp_path):
    # planted 3-group data with ties; replay pooled mid-ranks in python
    import itertools

    vals = {"a": [1.0, 2.0, 2.0, 5.0], "b": [2.0, 3.0, 6.0, 6.0], "c": [4.0, 6.0, 7.0, 8.0]}
    rows = [
        (f"2024-01-01 04:{i:02d}:00", 1, t, v)
        for i, (t, v) in enumerate(itertools.chain(*[[(t, v) for v in vs] for t, vs in vals.items()]))
    ]
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = QUERIES["kruskal_wallis_value_by_type"](spark, sf).collect()[0]

    pooled = sorted(v for vs in vals.values() for v in vs)
    n = len(pooled)

    def midrank(v):
        lo = sum(1 for x in pooled if x < v)
        c = sum(1 for x in pooled if x == v)
        return lo + (c + 1) / 2.0

    rsq = sum(sum(midrank(v) for v in vs) ** 2 / len(vs) for vs in vals.values())
    h = 12.0 / (n * (n + 1)) * rsq - 3.0 * (n + 1)
    from collections import Counter

    cnt = Counter(pooled)
    cc = 1.0 - sum(c**3 - c for c in cnt.values()) / (n**3 - n)
    assert r["n"] == n and r["k_groups"] == 3 and r["df"] == 2
    assert abs(r["h_q6"] / 1e6 - h) < 1e-5
    assert abs(r["h_tie_q6"] / 1e6 - h / cc) < 1e-5


def test_kruskal_wallis_plan_has_no_global_window(spark):
    plan = QUERIES["kruskal_wallis_value_by_type"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    import re

    # every windowspecdefinition must carry a partition column
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert m.group(1).split(",")[0].strip() != "", plan[:2000]
    assert "windowspecdefinition(value" not in plan  # ranks are bucket-partitioned
    assert "windowspecdefinition(_b" in plan


def test_wasserstein_identical_halves_zero(spark, tmp_path):
    # same distribution Sat (weekend) and Mon (weekday) -> W1 == 0
    vals = [1.0, 2.0, 3.0, 5.0, 8.0] * 4
    rows = [(f"2024-01-06 05:{i:02d}:00", 1, "t", v) for i, v in enumerate(vals)] + [
        (f"2024-01-08 05:{i:02d}:00", 1, "t", v) for i, v in enumerate(vals)
    ]
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = QUERIES["wasserstein_weekend_shift"](spark, sf).collect()[0]
    assert r["n_weekend"] == len(vals) and r["n_weekday"] == len(vals)
    assert r["w1_q6"] == 0


def test_wasserstein_pure_shift_equals_delta(spark, tmp_path):
    # weekday = weekend + 2.5 exactly -> W1 == 2.5 (translation identity)
    vals = [1.0, 2.0, 4.0, 7.0, 11.0]
    rows = [(f"2024-01-06 06:{i:02d}:00", 1, "t", v) for i, v in enumerate(vals)] + [
        (f"2024-01-08 06:{i:02d}:00", 1, "t", v + 2.5) for i, v in enumerate(vals)
    ]
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = QUERIES["wasserstein_weekend_shift"](spark, sf).collect()[0]
    assert r["w1_q6"] == 2_500_000


def test_brier_murphy_identity(spark):
    r = QUERIES["brier_decomposition"](spark, SF).collect()[0]
    # BS = REL - RES + UNC holds exactly for bin-constant forecasts;
    # quantization allows a few ppm of slack
    assert abs(r["brier_q6"] - (r["rel_q6"] - r["res_q6"] + r["unc_q6"])) <= 3
    assert 0 <= r["brier_q6"] <= 1_000_000
    assert r["rel_q6"] >= 0 and r["res_q6"] >= 0
    assert 0 <= r["unc_q6"] <= 250_000  # o(1-o) <= 1/4
    assert r["n_eval"] > 0


def test_cronbach_alpha_bounds_and_mean_r(spark):
    r = QUERIES["cronbachs_alpha_items"](spark, SF).collect()[0]
    k = r["k_items"]
    assert k == 4 and r["n"] > 0
    alpha, mean_r = r["alpha_q6"] / 1e6, r["mean_r_q6"] / 1e6
    assert alpha <= 1.0 + 1e-6
    # Spearman-Brown consistency: alpha == k*r / (1 + (k-1)*r) for
    # standardized items (both derived from the same composite variance)
    assert abs(alpha - k * mean_r / (1 + (k - 1) * mean_r)) < 1e-4


def test_fk_audit_star_schema_keys_hold(spark):
    rows = {r["child"]: r for r in QUERIES["fk_candidate_audit"](spark, SF).collect()}
    assert len(rows) == 6
    for true_fk in ("lineitem.l_orderkey", "lineitem.l_partkey",
                    "lineitem.l_suppkey", "orders.o_custkey",
                    "customer.c_nationkey"):
        r = rows[true_fk]
        assert r["is_inclusion"] == 1 and r["containment_q6"] == 1_000_000
        assert r["parent_unique"] == 1
    for r in rows.values():
        assert 0 <= r["contained"] <= r["child_distinct"]


def test_fd_audit_keys_hold_and_fanouts_sane(spark):
    rows = {r["candidate"]: r for r in QUERIES["functional_dependency_audit"](spark, SF).collect()}
    assert rows["orders: o_orderkey -> o_orderstatus"]["holds"] == 1
    assert rows["customer: c_custkey -> c_nationkey"]["holds"] == 1
    for r in rows.values():
        assert r["max_fanout"] >= 1
        assert (r["holds"] == 1) == (r["violating_groups"] == 0)
        assert r["violating_groups"] <= r["n_groups"]


def test_ams_f2_estimates_concentrate(spark):
    r = QUERIES["ams_f2_sketch"](spark, SF).collect()[0]
    assert r["reps"] == 32
    assert r["exact_f2"] > 0
    # std of one AMS estimate is sqrt(2)*F2; the 32-rep median should land
    # well within a factor of 2 of the truth on real data
    assert 0.3 * r["exact_f2"] <= r["median_est"] <= 3.0 * r["exact_f2"]
    assert abs(r["median_rel_err_q4"]) <= 20_000


def test_kendall_tau_planted_orderings(spark, tmp_path):
    # day d: volume d+1 events, mean value increasing with d -> tau = +1
    rows = []
    for d in range(8):
        for i in range(d + 1):
            rows.append((f"2024-01-{d + 1:02d} 07:{i:02d}:00", 1, "t", float(10 * d)))
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = QUERIES["kendall_tau_daily"](spark, sf).collect()[0]
    assert r["n_days"] == 8
    assert r["discordant"] == 0 and r["concordant"] == 8 * 7 // 2
    assert r["tau_b_q6"] == 1_000_000
    # reverse the value ordering -> tau = -1
    rows2 = []
    for d in range(8):
        for i in range(d + 1):
            rows2.append((f"2024-01-{d + 1:02d} 07:{i:02d}:00", 1, "t", float(-10 * d)))
    sf2 = _with_events(tmp_path / "rev", _synthetic_events(spark, rows2))
    r2 = QUERIES["kendall_tau_daily"](spark, sf2).collect()[0]
    assert r2["tau_b_q6"] == -1_000_000


def test_gumbel_return_levels_ordered_and_consistent(spark):
    from weatherdatapipeline_spark.queries import (
        _GUMBEL_Y100,
        _GUMBEL_Y30,
    )

    for r in QUERIES["evt_gumbel_return_levels"](spark, SF).collect():
        mu, sig = r["gumbel_mu_q4"] / 1e4, r["gumbel_sigma_q4"] / 1e4
        assert sig > 0 and r["n_days"] > 1
        assert abs(r["rl30_q4"] / 1e4 - (mu + sig * _GUMBEL_Y30)) < 4e-4
        assert abs(r["rl100_q4"] / 1e4 - (mu + sig * _GUMBEL_Y100)) < 4e-4
        assert r["rl100_q4"] > r["rl30_q4"] > r["gumbel_mu_q4"]


def test_theil_decomposition_identity(spark):
    r = QUERIES["theil_inequality_decomposition"](spark, SF).collect()[0]
    assert r["theil_total_q6"] >= 0
    assert r["theil_within_q6"] >= 0 and r["theil_between_q6"] >= -1
    assert abs(r["theil_total_q6"] - (r["theil_within_q6"] + r["theil_between_q6"])) <= 2


def test_df_unit_root_mean_reverting_vs_walk(spark, tmp_path):
    # strongly mean-reverting daily series (alternating high/low) rejects;
    # a deterministic pure trend (random-walk-like, gamma ~ 0) does not
    rows = []
    for d in range(28):
        v = 100.0 + (25.0 if d % 2 == 0 else -25.0)
        rows.append((f"2024-01-{d + 1:02d} 12:00:00", 1, "mr", v))
        rows.append((f"2024-01-{d + 1:02d} 12:00:00", 1, "rw", 100.0 + 3.0 * d))
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = {x["event_type"]: x for x in QUERIES["df_unit_root_daily"](spark, sf).collect()}
    assert r["mr"]["mean_reverting_5pct"] == 1
    assert r["mr"]["gamma_q6"] < -1_500_000  # gamma ~ -2 for alternation
    assert r["rw"]["mean_reverting_5pct"] == 0
    assert abs(r["rw"]["gamma_q6"]) < 100_000  # trend: gamma ~ 0


def test_rdd_planted_jump(spark, tmp_path):
    # full factorial (40 positions x 5 outcome slots) each side: outcome
    # mix identical at every position, so slope = 0 and intercept = rate
    # exactly; left rate 0.2, right rate 0.8 -> jump = 0.6
    rows = []
    for keep, lo in ((1, 150.0), (4, 250.0)):
        for j in range(200):
            t = "purchase" if (j % 5) < keep else "view"
            v = lo + (j // 5) * 2.5
            rows.append((f"2024-01-01 08:{j // 60:02d}:{j % 60:02d}", 1, t, v))
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = QUERIES["regression_discontinuity_value"](spark, sf).collect()[0]
    assert r["n_left"] == 200 and r["n_right"] == 200
    assert abs(r["jump_q6"] / 1e6 - 0.6) < 1e-6
    assert r["a_left_q6"] == 200_000 and r["a_right_q6"] == 800_000
    assert abs(r["b_left_q6"]) <= 1 and abs(r["b_right_q6"]) <= 1


def test_aipw_recovers_planted_effect(spark, tmp_path):
    # outcome = 10*hour + 5*weekend: saturated nuisances make AIPW exact
    rows = []
    k = 0
    for day, wk in (("06", True), ("07", True), ("08", False), ("09", False)):
        for h in (3, 15):
            for j in range(25):
                y = 10.0 * h + (5.0 if wk else 0.0) + (j % 5) * 0.01
                rows.append((f"2024-01-{day} {h:02d}:{j:02d}:00", 1, "t", y))
                k += 1
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = QUERIES["aipw_doubly_robust_ate"](spark, sf).collect()[0]
    assert r["n"] == k
    assert abs(r["ate_q6"] / 1e6 - 5.0) < 1e-3
    assert r["ci_lo_q6"] <= r["ate_q6"] <= r["ci_hi_q6"]


def test_heaps_fit_in_natural_text_range(spark):
    r = QUERIES["heaps_law_fit"](spark, SF).collect()[0]
    assert r["n_sources"] >= 2
    beta = r["beta_q6"] / 1e6
    assert 0.0 < beta < 1.2  # sublinear-ish vocab growth
    assert 0.0 <= r["r2_q6"] / 1e6 <= 1.0 + 1e-9


def test_join_cardinality_fk_exact_skew_underestimates(spark):
    rows = {r["join_name"]: r for r in QUERIES["join_cardinality_estimate"](spark, SF).collect()}
    # clean FK joins: every left key appears, |join| == |fact side|;
    # d_left == n_left (key side) makes the uniform estimate exact
    for fk in ("orders_x_lineitem", "part_x_lineitem"):
        r = rows[fk]
        assert r["exact_rows"] >= max(r["n_left"], r["n_right"])
        assert r["est_over_exact_q4"] == 10_000  # estimate exact on FK joins
    # skewed self-join: exact = sum c^2 >= n^2/d (Cauchy-Schwarz), with
    # equality only under perfect uniformity -> estimate underestimates
    sj = rows["events_self_user"]
    assert sj["exact_rows"] * sj["d_left"] >= sj["n_left"] * sj["n_right"]
    assert sj["est_over_exact_q4"] <= 10_000


def test_horvitz_thompson_unbiased_ballpark(spark):
    rows = QUERIES["horvitz_thompson_total"](spark, SF).collect()
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}
    for r in rows:
        assert 0 < r["n_sampled"] < r["n_pop"]
        # md5 uniformity: sampling fraction lands near p
        frac = r["n_sampled"] / r["n_pop"]
        assert abs(frac - r["p_q6"] / 1e6) < 0.6 * r["p_q6"] / 1e6 + 0.02
        # HT total is within 40% at sf0.001 sample sizes
        assert abs(r["rel_err_q4"]) < 4_000


def test_poisson_glm_recovers_planted_growth(spark, tmp_path):
    # plant counts exp(3 + 0.1*day): Poisson GLM on exact lambda data
    # recovers b1 = 0.1 * sd(day index) after standardization
    import math as m

    rows = []
    days = 16
    for d in range(days):
        cnt = round(m.exp(3.0 + 0.1 * d))
        for j in range(cnt):
            rows.append((f"2024-01-{d + 1:02d} 09:{j // 60:02d}:{j % 60:02d}", 1, "g", 1.0))
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    r = QUERIES["poisson_glm_daily_trend"](spark, sf).collect()[0]
    idx = list(range(days))
    mu = sum(idx) / days
    sd = (sum(i * i for i in idx) / days - mu * mu) ** 0.5
    assert r["n_days"] == days
    # rounding of counts perturbs the fit slightly
    assert abs(r["b1"] - 0.1 * sd) < 0.01
    assert r["deviance"] < 1.0  # near-exact exponential counts


def test_shapley_efficiency_on_full_coverage(spark, tmp_path):
    # synthetic: every one of the 16 coalitions observed; conversion iff
    # click touched (v(S) = 1 when click in S else 0) -> all credit to
    # click (phi_click = 1), others 0; efficiency: sum(phi) = v(full)-v(0)
    rows = []
    uid = 0
    bits = {"view": 1, "click": 2, "signup": 4, "error": 8}
    for mask in range(16):
        uid += 1
        j = 0
        for name, bit in bits.items():
            if mask & bit:
                rows.append((f"2024-01-02 10:{j:02d}:00", uid, name, 1.0))
                j += 1
        if mask & 2:  # click present -> converts
            rows.append((f"2024-01-02 10:59:00", uid, "purchase", 1.0))
        if j == 0 and not (mask & 2):
            # empty coalition user still needs at least one event row to
            # exist in the table: give them a purchase-free 'other'? No —
            # schema allows any type; use a non-channel, non-purchase type
            rows.append((f"2024-01-02 10:58:00", uid, "noop", 1.0))
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    out = {r["channel"]: r for r in QUERIES["shapley_attribution_channels"](spark, sf).collect()}
    assert out["click"]["n_coalitions_observed"] == 16
    assert out["click"]["phi_q6"] == 1_000_000
    for ch in ("view", "signup", "error"):
        assert out[ch]["phi_q6"] == 0


def test_sequential_pairs_gap_vs_contiguous(spark, tmp_path):
    # a -> x -> x -> b : gapped pattern (a,b) must be found (gap 3 <= 5),
    # but (a,c) with c six positions later must NOT
    seq = ["a", "x", "x", "b", "x", "x", "c"]
    rows = [(f"2024-01-03 11:{i:02d}:00", 7, t, 1.0) for i, t in enumerate(seq)]
    sf = _with_events(tmp_path, _synthetic_events(spark, rows))
    got = {(r["a"], r["b"]): r["support"] for r in QUERIES["sequential_pattern_pairs"](spark, sf).collect()}
    assert got[("a", "b")] == 1
    assert ("a", "c") not in got  # c is 6 after a, beyond the lookahead
    assert got[("b", "c")] == 1  # 3 apart
    # supports are user-distinct: repeating x->x many times still counts 1
    assert got[("x", "x")] == 1


def test_ece_bounds_and_brier_consistency(spark):
    r = QUERIES["expected_calibration_error"](spark, SF).collect()[0]
    assert 1 <= r["n_bins"] <= 10
    assert 0 <= r["ece_q6"] <= r["mce_q6"] <= 1_000_000
    # ECE lower-bounds sqrt(reliability) loosely: just sanity vs Brier REL
    b = QUERIES["brier_decomposition"](spark, SF).collect()[0]
    assert (r["ece_q6"] / 1e6) ** 2 <= b["rel_q6"] / 1e6 + 0.01
