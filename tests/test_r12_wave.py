"""Round-12 wave: semantic assertions for the new analytics queries.
Oracle hash parity is covered by tools/check_oracle.py; these pin the
MATH against pure-Python replays and fixed-point properties the hashes
can't see."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from weatherdatapipeline_spark.queries import QUERIES, _t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from weatherdatapipeline_spark.session import get_spark

    return get_spark("r12-wave-tests")


@pytest.fixture(scope="module")
def events(spark):
    return [
        (r["user_id"], r["ts"], r["event_type"], r["value"], r["event_id"])
        for r in _t(spark, SF, "events")
        .select("user_id", "ts", "event_type", "value", "event_id")
        .collect()
    ]


def _md5bit(salt: str, uid: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{salt}{uid}".encode()).hexdigest()[:8], 16) % 2


def test_double_ml_matches_pure_python(spark):
    # sf0.001 has 2 users (theta degenerates to NULL); replay at sf0.01
    sf = "/root/testdata/sf0.01"
    events = [
        (r["user_id"], r["ts"], r["event_type"], r["value"], r["event_id"])
        for r in _t(spark, sf, "events")
        .select("user_id", "ts", "event_type", "value", "event_id")
        .collect()
    ]
    row = QUERIES["double_ml_partial_linear"](spark, sf).collect()[0]
    users: dict = {}
    for u, ts, t, v, _ in events:
        h, y = users.get(u, (None, 0))
        first = ts if h is None or ts < h else h
        users[u] = (first, y + (1 if t == "purchase" else 0))
    rows = [
        (_md5bit("dml:", u), _md5bit("fold:", u), ts.hour, y)
        for u, (ts, y) in users.items()
    ]
    cells: dict = defaultdict(lambda: [0, 0, 0])
    for t, f, h, y in rows:
        c = cells[(f, h)]
        c[0] += 1
        c[1] += y
        c[2] += t
    num = den = 0
    n_used = 0
    for t, f, h, y in rows:
        key = (1 - f, h)
        if key not in cells:
            continue
        n, sy, st = cells[key]
        # cells dict was built keyed by the row's OWN fold; serving fold
        # is flipped, so look up the cell built FROM the other fold
        yr = y - sy / n
        tr = t - st / n
        num += round(yr * tr * 1e6)
        den += round(tr * tr * 1e6)
        n_used += 1
    assert row["n_users"] == n_used
    if den == 0:
        assert row["theta_q6"] is None
    else:
        assert row["theta_q6"] == round(num / den * 1e6)


def test_james_stein_shrinks_toward_grand_mean(spark):
    rows = QUERIES["james_stein_type_dow_means"](spark, SF).collect()
    assert len(rows) == 35
    shrinks = {r["shrink_q6"] for r in rows}
    assert len(shrinks) == 1  # one global factor
    c = shrinks.pop() / 1e6
    assert 0.0 <= c <= 1.0
    means = [r["mean_q4"] for r in rows]
    xbar = sum(means) / len(means)
    for r in rows:
        # shrunk estimate sits between the raw mean and the grand mean
        lo, hi = sorted((r["mean_q4"], xbar))
        assert lo - 2 <= r["js_mean_q4"] <= hi + 2  # q4 rounding slack


def test_chow_f_nonnegative_and_segments_split(spark):
    row = QUERIES["chow_test_daily_value"](spark, SF).collect()[0]
    assert row["chow_f_q4"] >= 0
    assert 0 < row["n_pre"] < row["n_days"]


def test_page_trend_matches_pure_python(spark, events):
    row = QUERIES["page_trend_dow"](spark, SF).collect()[0]
    weeks: dict = defaultdict(dict)
    for u, ts, t, v, _ in events:
        d = ts.date()
        monday = d.toordinal() - d.weekday()
        cell = weeks[monday]
        cell[d.weekday()] = cell.get(d.weekday(), 0) + round(v * 100)
    full = [w for w in weeks.values() if len(w) == 7]
    l_stat = 0
    for w in full:
        order = sorted(w.items(), key=lambda kv: (kv[1], kv[0]))
        for rank, (dow, _) in enumerate(order, 1):
            l_stat += (dow + 1) * rank
    assert row["n_weeks"] == len(full)
    assert row["page_l"] == l_stat
    b = len(full)
    el = b * 7 * 64 / 4.0
    varl = b * 49 * 64 * 6 / 144.0
    assert row["z_q4"] == round((l_stat - el) / math.sqrt(varl) * 1e4)


def test_harmonic_centrality_exact_on_toy_graph(spark):
    from weatherdatapipeline_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a LONG, b LONG"
    )
    seeds = spark.createDataFrame([(1,)], "node LONG")
    got = {
        (r["seed"], r["n"]): r["dist"]
        for r in G.per_seed_bfs(edges, seeds, max_hops=3).collect()
    }
    assert got == {(1, 1): 0, (1, 2): 1, (1, 3): 2, (1, 4): 3}


def test_harmonic_query_consistent_with_khop(spark):
    har = {
        r["seed"]: (r["n_reached"], r["harmonic6"])
        for r in QUERIES["harmonic_centrality_seeds"](spark, SF).collect()
    }
    for seed, (n, h6) in har.items():
        # each reached node contributes 2..6 to harmonic6
        assert 2 * n <= h6 <= 6 * n


def test_dunning_g2_nonneg_and_sorted(spark):
    rows = QUERIES["dunning_g2_collocations"](spark, SF).collect()
    assert rows, "sf0.001 corpus has >= 1 bigram with count >= 5"
    g2s = [r["g2_q4"] for r in rows]
    assert g2s == sorted(g2s, reverse=True)
    assert all(r["pair_cnt"] >= 5 for r in rows)
    assert all(
        r["pair_cnt"] <= min(r["w1_first"], r["w2_second"]) for r in rows
    )


def test_elasticity_matches_pure_python(spark):
    li = [
        (r["l_extendedprice"], r["l_quantity"])
        for r in _t(spark, SF, "lineitem")
        .select("l_extendedprice", "l_quantity")
        .collect()
    ]
    n = len(li)
    sx = sy = sxx = sxy = syy = 0
    for p, q in li:
        x = math.log(p / q)
        y = math.log(q)
        sx += round(x * 1e6)
        sy += round(y * 1e6)
        sxx += round(x * x * 1e6)
        sxy += round(x * y * 1e6)
        syy += round(y * y * 1e6)
    vxx = sxx / 1e6 - (sx / 1e6) * (sx / 1e6) / n
    vxy = sxy / 1e6 - (sx / 1e6) * (sy / 1e6) / n
    row = QUERIES["price_elasticity_loglog"](spark, SF).collect()[0]
    assert row["n_lines"] == n
    assert row["elasticity_q6"] == round(vxy / vxx * 1e6)
    # a TPC-H-ish fixture has no planted price-demand relation: the
    # elasticity should be near zero, far from a real demand curve's -1
    assert abs(row["elasticity_q6"]) < 0.5 * 1e6


def test_anderson_darling_matches_pure_python(spark, events):
    vals = defaultdict(lambda: [0, 0])
    for u, ts, t, v, _ in events:
        wk = ts.isoweekday() in (6, 7)
        cell = vals[v]
        cell[0] += 1
        cell[1] += 1 if wk else 0
    n = sum(c[0] for c in vals.values())
    nw = sum(c[1] for c in vals.values())
    cl = cw = 0
    tw = td = 0
    for v in sorted(vals):
        l, fw = vals[v]
        cl += l
        cw += fw
        bj = cl - l / 2.0
        den = bj * (n - bj) - n * l / 4.0
        if den > 0:
            mw = cw - fw / 2.0
            md = (cl - cw) - (l - fw) / 2.0
            tw += round((l / n) * (n * mw - nw * bj) ** 2 / den * 1e6)
            td += round((l / n) * (n * md - (n - nw) * bj) ** 2 / den * 1e6)
    a2 = (n - 1) / n * (tw / 1e6 / nw + td / 1e6 / (n - nw))
    row = QUERIES["anderson_darling_weekend"](spark, SF).collect()[0]
    assert (row["n_weekend"], row["n_weekday"]) == (nw, n - nw)
    assert row["a2_q6"] == round(a2 * 1e6)


def test_silhouette_bounded_and_covers_points(spark):
    rows = QUERIES["kmeans_silhouette_simplified"](spark, SF).collect()
    emb_n = _t(spark, SF, "embeddings").count()
    assert sum(r["n"] for r in rows) == emb_n
    for r in rows:
        assert -10000 <= r["mean_sil_q4"] <= 10000


def test_topsis_closeness_bounded_topk(spark):
    rows = QUERIES["topsis_supplier_ranking"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    cs = [r["closeness_q6"] for r in rows]
    assert cs == sorted(cs, reverse=True)
    assert all(0 <= c <= 1_000_000 for c in cs)


def test_markov_removal_effect_shares_sum_to_one(spark):
    rows = QUERIES["markov_removal_effect"](spark, SF).collect()
    assert {r["channel"] for r in rows} == {"click", "error", "signup", "view"}
    shares = [r["attribution_q6"] for r in rows]
    assert all(s is not None for s in shares)
    assert abs(sum(shares) - 1_000_000) <= 4  # q6 rounding of 4 shares


def test_approx_distinct_audit_true_flag(spark):
    row = QUERIES["approx_distinct_error_audit"](spark, SF).collect()[0]
    assert row["within_3rse"] is True
    assert row["exact_users"] > 0


def test_multimodal_features_match_fake_fold(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in _t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    got = {
        r["media_id"]: (r["n_bytes"], r["f0"], r["f1"])
        for r in QUERIES["multimodal_feature_extract"](spark, SF).collect()
    }
    assert set(got) == set(docs)
    import struct

    for did, text in list(sorted(docs.items()))[:25]:
        blob = text.encode()
        acc = [0, 0, 0, 0]
        for i, byte in enumerate(blob):
            acc[i % 4] = (acc[i % 4] * 31 + byte) % 100_003
        f32 = [
            struct.unpack("f", struct.pack("f", v / 100_003.0))[0] for v in acc
        ]
        nb, f0, f1 = got[did]
        assert nb == len(blob)
        assert f0 == round(f32[0], 6)
        assert f1 == round(f32[1], 6)


def test_mood_median_split_counts(spark, events):
    row = QUERIES["mood_median_by_type"](spark, SF).collect()[0]
    vals = sorted(v for _, _, _, v, _ in events)
    n = len(vals)
    # lower median: smallest value whose cumulative count reaches ceil(n/2)
    med = vals[(n + 1) // 2 - 1]
    assert row["grand_median"] == round(med, 2)
    assert row["chi2_q4"] >= 0
    assert row["df"] == 4


def test_kendalls_w_consistent_with_page(spark):
    row = QUERIES["kendalls_w_dow"](spark, SF).collect()[0]
    page = QUERIES["page_trend_dow"](spark, SF).collect()[0]
    assert row["n_weeks"] == page["n_weeks"]
    assert 0 <= row["kendalls_w_q6"] <= 1_000_000
    # Friedman chi2 = b(k-1)W with k=7
    w = row["kendalls_w_q6"] / 1e6
    assert abs(row["friedman_chi2_q4"] / 1e4 - row["n_weeks"] * 6 * w) < 0.01


def test_jonckheere_matches_pure_python(spark, events):
    from collections import defaultdict as dd

    row = QUERIES["jonckheere_terpstra_hours"](spark, SF).collect()[0]
    segs = dd(list)
    for u, ts, t, v, _ in events:
        segs[ts.hour // 6].append(v)
    j2 = 0
    for i in range(4):
        for jx in range(i + 1, 4):
            for a in segs[i]:
                for b in segs[jx]:
                    if a < b:
                        j2 += 2
                    elif a == b:
                        j2 += 1
    assert row["j2_exact"] == j2
    assert row["n_events"] == sum(len(s) for s in segs.values())


def test_rake_phrases_stopword_free(spark):
    from weatherdatapipeline_spark.operators.text import RAKE_STOPWORDS

    rows = QUERIES["rake_keyword_phrases"](spark, SF).collect()
    assert 0 < len(rows) <= 15
    scores = [r["score_q6"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["n_occurrences"] >= 1
        for w in r["phrase"].split(" "):
            assert w and w not in RAKE_STOPWORDS


def test_srm_chi2_matches_counts(spark, events):
    import hashlib

    row = QUERIES["srm_check_md5_arm"](spark, SF).collect()[0]
    users = {u for u, *_ in events}
    n1 = sum(
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        for u in users
    )
    n0 = len(users) - n1
    assert (row["n_arm0"], row["n_arm1"]) == (n0, n1)
    assert row["srm_chi2_q4"] == round((n0 - n1) ** 2 / (n0 + n1) * 1e4)
    assert 0 <= row["worst_hour"] <= 23


def test_ngram_uniqueness_bounds(spark):
    rows = QUERIES["ngram_uniqueness_ratio"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_unique"] <= r["n_grams"]
        assert r["uniqueness_q6"] == round(r["n_unique"] / r["n_grams"] * 1e6)


def test_retention_halflife_consistent_sign(spark):
    row = QUERIES["retention_halflife_fit"](spark, SF).collect()[0]
    assert row["n_offsets"] >= 2
    if row["weekly_decay_q6"] < 0:
        assert row["halflife_weeks_q4"] is not None
        assert row["halflife_weeks_q4"] > 0
        # halflife = ln2 / -slope at q4
        assert row["halflife_weeks_q4"] == round(
            math.log(2) / -(row["weekly_decay_q6"] / 1e6) * 1e4
        ) or abs(
            row["halflife_weeks_q4"]
            - math.log(2) / -(row["weekly_decay_q6"] / 1e6) * 1e4
        ) <= 200  # q6 slope rounding propagates into the q4 check
    else:
        assert row["halflife_weeks_q4"] is None


def test_cluster_size_histogram_accounts_for_all_docs(spark):
    rows = QUERIES["dedup_cluster_size_histogram"](spark, SF).collect()
    n_docs = _t(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_clusters"] >= 1
        if r["log2_size"] == 0:
            assert r["n_clusters"] == r["n_docs"]  # singletons
        else:
            # bucket b holds clusters of size in [2^b, 2^(b+1))
            assert r["n_docs"] >= r["n_clusters"] * (1 << r["log2_size"])


def test_mad_outliers_pure_python(spark, events):
    from collections import defaultdict as dd

    rows = {
        r["event_type"]: r
        for r in QUERIES["mad_robust_outliers_by_type"](spark, SF).collect()
    }
    by_t = dd(list)
    for u, ts, t, v, _ in events:
        by_t[t].append(v)
    for t, vs in by_t.items():
        vs.sort()
        med = vs[(len(vs) + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        r = rows[t]
        assert r["median"] == round(med, 2)
        assert r["mad"] == round(mad, 2)
        n_out = sum(1 for v in vs if abs(0.6745 * (v - med) / mad) > 3.5)
        assert r["n_outliers"] == n_out


def test_quantile_normalize_exact_aligns_sources(spark):
    rows = QUERIES["quantile_normalize_exact_lengths"](spark, SF).collect()
    docs = _t(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == docs
    norm_means = [r["mean_normalized"] for r in rows]
    raw_means = [r["mean_raw"] for r in rows]
    # normalization aligns distributions: normalized means are closer
    # together than the raw ones (strictly, unless raw already aligned)
    if max(raw_means) - min(raw_means) > 1.0:
        assert max(norm_means) - min(norm_means) <= max(raw_means) - min(
            raw_means
        )


def test_partial_correlation_bounds(spark):
    row = QUERIES["partial_correlation_value_hour"](spark, SF).collect()[0]
    assert -1_000_000 <= row["r_value_hour_q6"] <= 1_000_000
    assert -1_000_000 <= row["partial_r_given_dow_q6"] <= 1_000_000


def test_funnel_time_to_convert_pure_python(spark, events):
    row = QUERIES["funnel_time_to_convert"](spark, SF).collect()[0]
    per = {}
    for u, ts, t, v, _ in events:
        vv, pp = per.get(u, (None, None))
        if t == "view" and (vv is None or ts < vv):
            vv = ts
        if t == "purchase" and (pp is None or ts < pp):
            pp = ts
        per[u] = (vv, pp)
    durs = sorted(
        int((pp - vv).total_seconds())
        for vv, pp in per.values()
        if vv is not None and pp is not None and pp >= vv
    )
    assert row["n_converted"] == len(durs)
    if durs:
        n = len(durs)
        assert row["median_secs"] == durs[(n + 1) // 2 - 1]
        assert row["p90_secs"] == durs[-(-9 * n // 10) - 1]


def test_icc_pure_python(spark, events):
    from collections import defaultdict as dd

    row = QUERIES["icc_user_values"](spark, SF).collect()[0]
    by_u = dd(list)
    for u, ts, t, v, _ in events:
        by_u[u].append(round(v * 100))
    g = len(by_u)
    n = sum(len(vs) for vs in by_u.values())
    s = sum(sum(vs) for vs in by_u.values())
    sq = sum(x * x for vs in by_u.values() for x in vs)
    n2 = sum(len(vs) ** 2 for vs in by_u.values())
    bs = sum(round(sum(vs) ** 2 / len(vs) * 1e6) for vs in by_u.values()) / 1e6
    ssb = bs - s * s / n
    ssw = sq - bs
    msb = ssb / (g - 1)
    msw = ssw / (n - g)
    k0 = (n - n2 / n) / (g - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert (row["n_users"], row["n_events"]) == (g, n)
    assert row["k0_q4"] == round(k0 * 1e4)
    assert row["icc1_q6"] == round(icc * 1e6)


def test_hill_estimator_pure_python(spark, events):
    row = QUERIES["hill_tail_index_values"](spark, SF).collect()[0]
    vals = sorted((v for _, _, _, v, _ in events), reverse=True)
    k = 200
    xk1 = vals[k]
    inv = sum(
        round((math.log(v) - math.log(xk1)) * 1e9) for v in vals[:k]
    ) / 1e9 / k
    assert row["k_used"] == k
    assert row["x_k1"] == round(xk1, 2)
    assert row["hill_alpha_q4"] == round(1.0 / inv * 1e4)


def test_frequent_sequences_match_brute(spark, events):
    from collections import defaultdict as dd

    got = {
        (r["antecedent"], r["consequent"]): r["n_users"]
        for r in QUERIES["frequent_sequences_2step"](spark, SF).collect()
    }
    per = dd(dict)
    for u, ts, t, v, _ in events:
        mn, mx = per[u].get(t, (None, None))
        per[u][t] = (
            ts if mn is None or ts < mn else mn,
            ts if mx is None or ts > mx else mx,
        )
    want = dd(int)
    for u, types in per.items():
        for a, (amn, _) in types.items():
            for b, (_, bmx) in types.items():
                if a != b and amn < bmx:
                    want[(a, b)] += 1
    assert got == dict(want)


def test_tukey_q_nonnegative_and_pairs(spark):
    rows = QUERIES["tukey_pairwise_contrasts"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) unordered type pairs
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["tukey_q_q4"] >= 0
        assert r["mean_diff"] >= 0


def test_weibull_fit_sane(spark):
    row = QUERIES["weibull_fit_time_to_convert"](spark, SF).collect()[0]
    assert row["n_durations"] >= 2
    assert row["shape_q4"] > 0  # latencies are positive-hazard
    assert row["scale_secs"] > 0


def test_price_indices_identities(spark):
    row = QUERIES["price_indices_yearly"](spark, SF).collect()[0]
    assert row["n_parts"] >= 1
    l, p, f = row["laspeyres_q6"], row["paasche_q6"], row["fisher_q6"]
    assert l > 0 and p > 0
    # Fisher is the geometric mean of the two
    assert f == round(math.sqrt((l / 1e6) * (p / 1e6)) * 1e6)


def test_jsd_pure_python(spark):
    from collections import defaultdict as dd

    docs = [
        (r["source"], r["text"])
        for r in _t(spark, SF, "documents").select("source", "text").collect()
    ]
    counts = dd(lambda: dd(int))
    for s, t in docs:
        for w in t.strip().lower().split():
            counts[s][w] += 1
    # NOTE: python split() collapses whitespace like the engine's \s+
    probs = {
        s: {w: c / sum(ws.values()) for w, c in ws.items()}
        for s, ws in counts.items()
    }
    got = {
        (r["source_a"], r["source_b"]): r["jsd_q6"]
        for r in QUERIES["jsd_source_pairs"](spark, SF).collect()
    }
    srcs = sorted(probs)
    assert set(got) == {(a, b) for a in srcs for b in srcs if a < b}
    for (a, b), v in got.items():
        pa, pb = probs[a], probs[b]
        ka = sum(
            round(p * math.log(p / ((p + pb.get(w, 0.0)) / 2)) * 1e12)
            for w, p in pa.items()
        )
        kb = sum(
            round(p * math.log(p / ((pa.get(w, 0.0) + p) / 2)) * 1e12)
            for w, p in pb.items()
        )
        jsd = (ka / 1e12 + kb / 1e12) / 2
        assert v == round(jsd * 1e6)
        assert 0 <= v <= round(math.log(2) * 1e6) + 1
