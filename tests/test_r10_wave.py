"""Round-10 wave: semantic assertions beyond oracle parity for the
Benford screen, JL projection audit, blocked record linkage (+cap
audit), session-overlap concurrency, and the shared co-supply part-cap
builder. Oracle hash parity is covered by tools/check_oracle.py; these
tests pin the MATH the hashes can't see (distribution identities,
blocking invariants, interval arithmetic)."""

from __future__ import annotations

import pytest

from weatherdatapipeline_spark.queries import (
    _BENFORD_P,
    _COSUPPLY_PART_CAP,
    _JL_M,
    _LINKAGE_BLOCK_CAP,
    _LINKAGE_MAX_DIST,
    QUERIES,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from weatherdatapipeline_spark.session import get_spark

    return get_spark("r10-wave-tests")


def test_benford_digits_and_shares(spark):
    rows = {r["digit"]: r for r in QUERIES["benford_price_audit"](spark, SF).collect()}
    assert set(rows) <= set(range(1, 10)) and 1 in rows
    # shares are parts-per-million of one total
    assert abs(sum(r["share_q6"] for r in rows.values()) - 1_000_000) <= len(rows)
    for d, r in rows.items():
        assert r["benford_q6"] == round(_BENFORD_P[d] * 1e6)
        assert r["chi2_q4"] >= 0
        assert r["n"] > 0


def test_jl_distortion_concentrates_near_one(spark):
    rows = QUERIES["jl_projection_distortion"](spark, SF).collect()
    assert rows
    n = sum(r["n"] for r in rows)
    mean_ratio = sum(r["sum_rq4"] for r in rows) / n / 1e4
    # E[|Pv|^2 / (m*|v|^2)] = 1 for Rademacher projections; the mean over
    # a few hundred vectors concentrates well inside +-15%
    assert 0.85 <= mean_ratio <= 1.15
    for r in rows:
        # band = rq4 // 1000 by construction
        assert 0 <= r["band"] <= 10_000
        assert r["sum_rq4"] >= r["band"] * 1000 * r["n"]


def test_linkage_pairs_share_block_and_threshold(spark):
    rows = QUERIES["record_linkage_part_names"](spark, SF).collect()
    assert rows
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)
    for r in rows:
        assert r["pk_a"] < r["pk_b"]
        assert r["dist"] <= _LINKAGE_MAX_DIST
        assert r["name_a"].split(" ")[-1] == r["name_b"].split(" ")[-1]


def test_linkage_cap_audit_consistency(spark):
    row = QUERIES["linkage_block_cap_audit"](spark, SF).collect()[0]
    assert row["block_cap"] == _LINKAGE_BLOCK_CAP
    assert row["n_blocks"] > 0
    assert 0 <= row["pairs_dropped"] <= row["pairs_total"]
    # the audit must agree with itself: blocks over cap iff rows dropped
    assert (row["blocks_capped"] > 0) == (row["rows_dropped"] > 0)
    if row["max_block_size"] > _LINKAGE_BLOCK_CAP:
        assert row["blocks_capped"] > 0


def test_session_overlap_intervals_positive_and_canonical(spark):
    rows = QUERIES["session_overlap_pairs"](spark, SF).collect()
    for r in rows:
        assert r["user_a"] < r["user_b"]
        assert r["n_overlaps"] >= 1
        assert r["overlap_seconds"] >= r["n_overlaps"]  # each overlap > 0s
    secs = [r["overlap_seconds"] for r in rows]
    assert secs == sorted(secs, reverse=True)


def test_cosupply_part_cap_audit_reads_zero_dropped_on_tpch(spark):
    # TPC-H bounds suppliers-per-part at 4, far under the cap: the audit
    # must report the cap NEVER engaging (and totals still counted)
    row = QUERIES["cosupply_part_cap_audit"](spark, SF).collect()[0]
    assert row["part_cap"] == _COSUPPLY_PART_CAP
    assert row["max_suppliers_per_part"] <= _COSUPPLY_PART_CAP
    assert row["parts_capped"] == 0
    assert row["edge_pairs_dropped"] == 0
    assert row["edge_pairs_total"] >= 0


def test_jl_sign_matrix_is_deterministic_and_balanced():
    from weatherdatapipeline_spark.queries import _JL_S, _jl_sign

    assert len(_JL_S) == _JL_M
    assert all(s in (1.0, -1.0) for row in _JL_S for s in row)
    assert _JL_S[3][17] == _jl_sign(3, 17)
    # Rademacher rows should be roughly balanced (md5 is uniform)
    for row in _JL_S:
        assert abs(sum(row)) <= len(row) * 0.6


def test_isotonic_fit_is_monotone_and_mass_preserving(spark):
    rows = sorted(
        QUERIES["isotonic_calibration_bins"](spark, SF).collect(),
        key=lambda r: r["b"],
    )
    assert rows
    fits = [r["iso_rate_q6"] for r in rows]
    assert fits == sorted(fits)  # the defining monotonicity constraint
    for r in rows:
        assert 0 <= r["iso_rate_q6"] <= 1_000_000
        assert r["purchases"] <= r["n"]
    # weighted mean is preserved by isotonic regression (projection onto
    # the monotone cone preserves the weighted total) up to quantization
    n = sum(r["n"] for r in rows)
    raw_mass = sum(r["purchases"] for r in rows) / n
    fit_mass = sum(r["iso_rate_q6"] / 1e6 * r["n"] for r in rows) / n
    assert abs(raw_mass - fit_mass) < 5e-5


def test_isotonic_matches_pav_replay(spark):
    """The relational minimax fit must equal a direct PAV pool replay."""
    rows = sorted(
        QUERIES["isotonic_calibration_bins"](spark, SF).collect(),
        key=lambda r: r["b"],
    )
    pools = [[float(r["purchases"]), float(r["n"])] for r in rows]
    i = 0
    while i < len(pools) - 1:
        if pools[i][0] / pools[i][1] > pools[i + 1][0] / pools[i + 1][1]:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand pool means back onto bins by walking bin weights
    out, pi, acc = [], 0, 0.0
    for r in rows:
        out.append(pools[pi][0] / pools[pi][1])
        acc += r["n"]
        if acc >= pools[pi][1] - 1e-9:
            pi, acc = pi + 1, 0.0
    got = [r["iso_rate_q6"] for r in rows]
    want = [round(m * 1e6) for m in out]
    assert got == want


def test_delta_method_ci_brackets_ratio(spark):
    rows = QUERIES["delta_method_ratio_ci"](spark, SF).collect()
    assert {r["arm"] for r in rows} == {0, 1}
    for r in rows:
        assert r["se_q6"] > 0
        assert r["ci_lo_q6"] < r["ratio_q6"] < r["ci_hi_q6"]
        # CI is symmetric around the ratio up to quantization
        assert abs((r["ratio_q6"] - r["ci_lo_q6"]) - (r["ci_hi_q6"] - r["ratio_q6"])) <= 2
        assert r["n_users"] > 0 and r["n_events"] >= r["n_users"]


def test_gbm_stumps_matches_pure_python_replay(spark):
    """Third-implementation check: replay the whole GBM recurrence in
    plain pandas/floats and require the IDENTICAL split path (feature,
    threshold per round) plus matching leaf deltas and monotone SSE."""
    import pandas as pd

    from weatherdatapipeline_spark.queries import _GBM_LR, _GBM_ROUNDS, _GBM_VBINS

    got = sorted(
        QUERIES["gbm_stumps_purchase"](spark, SF).collect(), key=lambda r: r["round"]
    )
    assert [r["round"] for r in got] == list(range(_GBM_ROUNDS + 1))
    sses = [r["sse_q6"] for r in got]
    assert sses == sorted(sses, reverse=True)  # boosting only improves SSE
    assert all(r["gain_q6"] > 0 for r in got[1:])

    df = pd.read_parquet(f"{SF}/events.parquet")
    df = df[df["value"].notna()].copy()
    ts = pd.to_datetime(df["ts"])
    vmin, vmax = float(df["value"].min()), float(df["value"].max())
    cells = pd.DataFrame(
        {
            "h": ts.dt.hour.astype(int),
            "d": ts.dt.weekday.astype(int),
            "vb": (
                ((df["value"] - vmin) * float(_GBM_VBINS) / (vmax - vmin))
                .pipe(lambda s: s.astype(float))
                .apply(lambda x: min(int(x // 1), _GBM_VBINS - 1))
            ),
            "y": (df["event_type"] == "purchase").astype(int),
        }
    )
    g = cells.groupby(["h", "d", "vb"]).agg(n=("y", "size"), ysum=("y", "sum")).reset_index()
    f0 = round(g["ysum"].sum() / g["n"].sum(), 9)
    g["pred"] = f0
    path = []
    for _ in range(_GBM_ROUNDS):
        g["rs"] = g["ysum"] - g["n"] * g["pred"]
        s_all, n_all = g["rs"].sum(), g["n"].sum()
        best = None
        for feat in ("h", "d", "vb"):
            fv = g.groupby(feat).agg(s=("rs", "sum"), cn=("n", "sum")).sort_index()
            sl, nl = 0.0, 0
            for t, row in fv.iterrows():
                sl, nl = sl + row["s"], nl + row["cn"]
                nr = n_all - nl
                if nr <= 0 or nl <= 0:
                    continue
                sr = s_all - sl
                gain = sl * sl / nl + sr * sr / nr - s_all * s_all / n_all
                key = (round(gain * 1e9), {"h": 0, "d": 1, "vb": 2}[feat], t)
                # argmax on quantized gain, tiebreak feature asc, t asc:
                # emulate ORDER BY gq9 DESC, feature, threshold LIMIT 1
                if best is None or (key[0], -key[1], -key[2]) > (
                    best[0], -best[1], -best[2]
                ):
                    best = (key[0], key[1], key[2], feat, sl, nl, sr, nr)
        _, _, t, feat, sl, nl, sr, nr = best
        leaf_l, leaf_r = _GBM_LR * (sl / nl), _GBM_LR * (sr / nr)
        path.append((feat, int(t)))
        upd = g[feat] <= t
        g["pred"] = (g["pred"] + leaf_l * upd + leaf_r * (~upd)).round(9)
    want_path = [(r["feature"], r["threshold"]) for r in got[1:]]
    assert path == want_path


def test_mutual_information_screen_bounds(spark):
    rows = {r["feature"]: r for r in QUERIES["mutual_information_screen"](spark, SF).collect()}
    assert set(rows) == {"h", "d", "vb"}
    for r in rows.values():
        assert r["hy_q6"] > 0  # binary label with both classes present
        assert r["mi_q6"] >= -1  # MI >= 0 up to q6 rounding
        assert r["mi_q6"] <= r["hy_q6"]  # MI(F;Y) <= H(Y)
        assert 0 <= r["nmi_q6"] <= 1_000_000


def test_feature_hashing_audit_structure(spark):
    from weatherdatapipeline_spark.queries import _FH_BUCKETS

    rows = QUERIES["feature_hashing_audit"](spark, SF).collect()
    assert rows
    occs = [r["occurrences"] for r in rows]
    assert occs == sorted(occs, reverse=True)
    for r in rows:
        assert 0 <= r["bucket"] < _FH_BUCKETS
        assert r["distinct_tokens"] >= 1
        assert r["top_token_cnt"] <= r["occurrences"]
        assert 0 < r["top_share_q6"] <= 1_000_000
        # share consistency up to quantization
        assert abs(r["top_share_q6"] - round(r["top_token_cnt"] / r["occurrences"] * 1e6)) <= 1


def test_grouped_logistic_fits_every_type(spark):
    rows = {r["event_type"]: r for r in QUERIES["grouped_logistic_by_type"](spark, SF).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r["n"] > 0
        # log-loss of a fitted binary model beats the worst case ln(2)
        # slightly relaxed for tiny groups
        assert 0 < r["log_loss"] < 0.75
        assert abs(r["b0"]) < 10 and abs(r["b1"]) < 10  # converged, not blown up


def test_quantile_normalization_aligns_sources(spark):
    rows = QUERIES["quantile_normalize_by_source"](spark, SF).collect()
    assert len(rows) >= 2
    # after normalization the per-source medians must agree much more
    # tightly than the raw medians (the whole point of the operator)
    orig = [r["orig_p50_q2"] for r in rows]
    norm = [r["norm_p50_q2"] for r in rows]
    spread_orig = max(orig) - min(orig)
    spread_norm = max(norm) - min(norm)
    assert spread_norm <= spread_orig
    for r in rows:
        assert r["n"] > 0


def test_flesch_scores_ordered_and_consistent(spark):
    rows = QUERIES["flesch_readability_scores"](spark, SF).collect()
    assert rows
    scores = [r["flesch_q2"] for r in rows]
    assert scores == sorted(scores)
    for r in rows:
        assert r["words"] > 0 and r["sentences"] >= 1
        got = round(
            (206.835
             - 1.015 * (r["words"] / r["sentences"])
             - 84.6 * (r["syllables"] / r["words"])) * 100
        )
        assert abs(got - r["flesch_q2"]) <= 1


def test_grid_density_separates_planted_blobs(spark, tmp_path_factory):
    """Two dense value blobs far apart plus sparse noise must come out
    as exactly two clusters with the noise cells excluded."""
    import datetime

    d = str(tmp_path_factory.mktemp("grid_sf"))
    rows = []
    eid = 0

    def add(n, hour, value):
        nonlocal eid
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, hour, 0, 0), 1, "view", float(value), "{}")
            )
            eid += 1

    # blob A: hours 1-2, low values; blob B: hours 20-21, high values
    for h in (1, 2):
        add(300, h, 5.0)
    for h in (20, 21):
        add(300, h, 95.0)
    add(3, 10, 50.0)  # noise: below the core threshold
    add(1, 0, 0.0)    # pins vmin
    add(1, 23, 100.0)  # pins vmax (cell stays sub-threshold)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    out = QUERIES["grid_density_clusters"](spark, d).collect()
    assert len(out) == 2  # the two blobs, noise cells dropped
    assert sum(r["n_points"] for r in out) == 1200
    assert all(r["n_cells"] >= 2 for r in out)


def test_rfm_segmentation_structure(spark):
    rows = QUERIES["rfm_segmentation"](spark, SF).collect()
    assert rows
    total = sum(r["n_users"] for r in rows)
    for r in rows:
        assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5
        assert r["n_users"] > 0
    # quintile coding puts ~20% of users in each score band per dimension
    for dim in ("r", "f", "m"):
        band1 = sum(r["n_users"] for r in rows if r[dim] == 1)
        assert 0.05 * total <= band1 <= 0.6 * total
    # monetary score monotonicity: avg revenue rises with m (aggregated)
    import collections
    by_m = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        by_m[r["m"]][0] += r["avg_revenue_q2"] * r["n_users"]
        by_m[r["m"]][1] += r["n_users"]
    means = [by_m[m][0] / by_m[m][1] for m in sorted(by_m)]
    assert means == sorted(means)
